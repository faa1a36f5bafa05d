"""Approximate-aggregate sketches (extension surface; the reference
has none — SURVEY.md §2 "not present").

Deterministic HyperLogLog: Spark's ``approx_count_distinct`` and
DuckDB's ``approx_count_distinct`` use different hash functions and
sketch layouts, so their estimates can never hash-match. This HLL is
built from the shared md5-derived ``hash64`` instead: bucket and
leading-zero rank are pure integer functions of the hash, the
register table is a plain groupBy-max, and the estimator arithmetic
is mirrored op-for-op in the oracle — the ESTIMATE ITSELF is
bit-reproducible across engines while remaining a true O(m)-memory
sketch.

At 100 TB this is the shape that matters: counting distinct users/
tokens/urls exactly needs a full shuffle of the distinct keys;
the sketch shuffles m=2^b integer registers per group — constant —
with map-side partial max-combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.hashing import hash64

# Bias-correction constants for m >= 64 (Flajolet et al. 2007).
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, b: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """HLL register table → ``(*group_cols, bucket, register)``,
    m = 2^b register rows per group.

    bucket = low b bits of the 60-bit hash; the remaining width =
    60 − b bits form ``w``; register = max over values of
    ρ(w) = (#leading zeros of w within width) + 1, computed EXACTLY
    via the base-2 digit count (``conv``/``bin`` string length — no
    float log2, whose rounding at power-of-two boundaries differs
    per libm). One hash-agg with map-side max combine; with
    ``group_cols`` the shuffle carries ≤ m rows per group — the
    mergeable per-key sketch shape (registers from different
    partitions/days combine by max)."""
    m = 1 << b
    width = 60 - b
    gcols = list(group_cols or [])
    h = hash64(F.col(col).cast("string"))
    # high bits via shiftright — exact (a double division of a 60-bit
    # int would round before the truncation)
    w = F.shiftright(h, b)
    # exact bit length: conv(w, 10, 2) is the binary digit string
    blen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(F.lit(width) + 1 - blen)
    return (
        df.select(
            *gcols, (h % m).cast("int").alias("bucket"), rho.cast("int").alias("rho")
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def _finalize_registers(
    registers: DataFrame,
    m: int,
    group_cols: list[str] | None = None,
    groups: DataFrame | None = None,
):
    """Shared HLL finalization — spine-fill absent buckets to
    register 0, then the standard estimator E = α_m·m²/Σ 2^(−M_j)
    with the small-range correction E ≤ 2.5m ∧ V>0 → m·ln(m/V).
    Returns ``(agg_df, est_col)`` where ``agg_df`` has one row per
    group (columns ``*group_cols, s, v``) and ``est_col`` is the
    estimate expression over it. Single definition so the estimator
    and its correction threshold cannot drift between the global,
    per-group, windowed, and union finalizers."""
    gcols = list(group_cols or [])
    spine = registers.sparkSession.range(m).select(
        F.col("id").cast("int").alias("bucket")
    )
    if gcols:
        if groups is None:
            groups = registers.select(*gcols).distinct()
        spine = groups.crossJoin(F.broadcast(spine))
    filled = spine.join(registers, gcols + ["bucket"], "left").select(
        *gcols, F.coalesce("register", F.lit(0)).alias("register")
    )
    agg = filled.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("s"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0)).alias("v"),
    )
    raw = F.lit(_alpha(m) * m * m) / F.col("s")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(raw)
    return agg, est


def hll_count_distinct(df: DataFrame, col: str, b: int = 6) -> DataFrame:
    """Deterministic HLL distinct estimate → one row ``(m, n_exact,
    n_hll, rel_err)`` (n_exact included for accuracy evaluation; a
    production 100-TB run would drop it — it is the expensive side).

    Estimator: E = α_m·m²/Σ 2^(−M_j) over all m registers (absent
    buckets count as register 0), with the standard small-range
    correction E ≤ 2.5m ∧ V>0 → m·ln(m/V). The float arithmetic is
    mirrored op-for-op in the oracle SQL; sums of 64 exact powers of
    two differ across fold orders only at ~1e-16 relative, far inside
    the 6-decimal output round."""
    m = 1 << b
    regs = hll_registers(df, col, b)
    agg, est = _finalize_registers(regs, m)
    exact = df.agg(F.countDistinct(col).alias("n_exact"))
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(m).alias("m"),
            "n_exact",
            F.round(est, 6).alias("n_hll"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_count_distinct_by(
    df: DataFrame, group_col: str, col: str, b: int = 8
) -> DataFrame:
    """Per-group deterministic HLL estimate → ``(group_col, n_exact,
    n_hll)`` — the shape that matters at scale: distinct users per
    event type / per day / per URL with a constant m-register state
    per key instead of a distinct shuffle per key. Absent buckets are
    synthesized from a (groups × m) spine so the estimator sees all m
    registers."""
    m = 1 << b
    regs = hll_registers(df, col, b, group_cols=[group_col])
    agg, est = _finalize_registers(
        regs, m, [group_col], groups=df.select(group_col).distinct()
    )
    exact = df.groupBy(group_col).agg(F.countDistinct(col).alias("n_exact"))
    return (
        agg.join(exact, group_col)
        .select(group_col, "n_exact", F.round(est, 6).alias("n_hll"))
    )


def cms_counters(
    tokens_df: DataFrame, term_col: str = "term", d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min sketch counter table → ``(r, bucket, c)``: d
    independent md5-derived hash rows × w counters; every token
    occurrence increments one counter per row. One hash-agg over a
    d-way explode (map-side combine), state is d·w integers per group
    — the mergeable (counters add) frequency sketch that replaces a
    full per-term shuffle at scale. All-integer: the oracle hash is
    trivially exact."""
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (hash64(F.concat(F.lit(f"cms{r}:"), F.col(term_col))) % w)
                    .cast("int")
                    .alias("bucket"),
                )
                for r in range(d)
            ]
        )
    )
    return (
        tokens_df.select(probes.alias("p"))
        .select(F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_topk_estimates(
    docs: DataFrame, text_col: str = "text", k: int = 20, d: int = 4, w: int = 1024
) -> DataFrame:
    """CMS frequency estimates for the exact top-k tokens →
    ``(term, n_exact, n_cms)``. n_cms = min over the d rows of the
    probed counter — ≥ n_exact always (CMS never under-counts), equal
    when no collision. Top-k selection is (count DESC, term) with
    TakeOrderedAndProject; everything is exact integers end-to-end."""
    from bigclam_apachespark_spark.functions.hashing import tokens

    tok = docs.select(F.explode(tokens(text_col)).alias("term"))
    counters = cms_counters(tok, "term", d, w)
    top = (
        tok.groupBy("term")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "term")
        .limit(k)
    )
    probes = top.select(
        "term",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (hash64(F.concat(F.lit(f"cms{r}:"), F.col("term"))) % w)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("p"),
    ).select("term", "n_exact", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(counters, ["r", "bucket"])
        .groupBy("term", "n_exact")
        .agg(F.min("c").alias("n_cms"))
    )

def finalize_windowed_hll(registers: DataFrame, b: int = 8) -> DataFrame:
    """Finalize streamed per-window HLL register rows
    ``(window_start, bucket, register)`` → ``(window_start, n_hll)``:
    synthesize absent buckets from a (windows × m) spine, then the
    standard estimator with small-range correction — the batch half
    of the registers-then-finalize split (streaming carries only the
    max-mergeable registers; see
    ``streaming.hll_users_windowed_stream``)."""
    m = 1 << b
    agg, est = _finalize_registers(registers, m, ["window_start"])
    return agg.select("window_start", F.round(est, 6).alias("n_hll"))

def hll_union_estimate(
    dfs: list[tuple[DataFrame, str]], b: int = 8
) -> DataFrame:
    """Distinct count of the UNION of several keyed columns via
    HLL register MERGE → one row ``(m, n_hll)``: each input's
    register table is computed independently and the merged sketch
    is the per-bucket MAX — the mergeability property that makes
    sketches the production answer for cross-table/cross-day
    distincts (merging exact sets would shuffle every key; merging
    sketches shuffles m integers per input).

    ``dfs`` is a list of (DataFrame, column) pairs; values are
    hashed through the shared deterministic hash, so the estimate
    hash-matches the DuckDB twin run over the SQL UNION."""
    regs = None
    for df, col in dfs:
        r = hll_registers(df, col, b)
        regs = r if regs is None else regs.unionByName(r)
    merged = regs.groupBy("bucket").agg(F.max("register").alias("register"))
    m = 1 << b
    agg, est = _finalize_registers(merged, m)
    return agg.select(F.lit(m).alias("m"), F.round(est, 6).alias("n_hll"))


def hll_sliding_estimate(
    events: DataFrame,
    hours: int = 3,
    b: int = 8,
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Trailing-``hours`` distinct-user estimate per hour by MERGING
    the hourly HLL register tables → ``(window_start,
    n_hll_trailing)`` — the sketch-mergeability pattern in its most
    common production form: hourly registers are computed ONCE (the
    same m-integer rows a streaming job checkpoints), and every
    sliding window is a per-bucket MAX over the covered hours'
    registers — the raw stream is never rescanned per window, and a
    window's merge cost is hours·m integers. The exact-distinct
    formulation re-shuffles every (window, user) pair — hours× the
    events table — which is precisely what sketches exist to avoid
    at 100 TB. Targets are the hours present in the data (a trailing
    window may cover absent earlier hours — they contribute
    nothing, exactly like an empty shard).

    Deterministic (md5-derived hash + exact bit-length registers),
    so the DuckDB twin hash-matches the ESTIMATES, not just
    approximately."""
    w = F.window(ts_col, "1 hour")
    keyed = events.select(w.alias("w"), key).select(
        F.col("w.start").alias("window_start"), key
    )
    hourly = hll_registers(keyed, key, b, group_cols=["window_start"])
    targets = hourly.select("window_start").distinct()
    contrib = hourly.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(hours)])
        ).alias("o"),
        "window_start",
        "bucket",
        "register",
    ).select(
        F.timestamp_add("HOUR", F.col("o"), F.col("window_start")).alias(
            "window_start"
        ),
        "bucket",
        "register",
    )
    merged = (
        contrib.join(targets, "window_start", "left_semi")
        .groupBy("window_start", "bucket")
        .agg(F.max("register").alias("register"))
    )
    m = 1 << b
    agg, est = _finalize_registers(merged, m, ["window_start"], groups=targets)
    return agg.select(
        "window_start", F.round(est, 6).alias("n_hll_trailing")
    )


def kmv_count_distinct_by(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values) distinct estimate per group →
    ``(group, n_exact, n_kmv, rel_err)`` — the third mergeable
    sketch family here (HLL estimates cardinality from register
    maxima, CMS frequencies from counter minima; KMV estimates
    cardinality from ORDER STATISTICS of the hash space, and unions
    merge by keeping the k smallest of the pooled hashes). With the
    k-th smallest 60-bit hash at h_k, the unbiased estimate is
    (k−1) / (h_k / 2⁶⁰). Groups with fewer than k distinct values
    report exactly (the sketch degenerates to the distinct set).

    ``n_exact`` (and hence ``rel_err``) counts distinct 60-bit
    HASHES, not distinct raw values: a raw-value pair colliding in
    hash space merges (probability ~n²/2⁶¹ — immaterial at any
    realistic n, but the column is hash-distinct cardinality, not
    literal COUNT(DISTINCT col)). Deduping on the hash keeps the
    one dedup agg shared between the exact side and the sketch
    side — one shuffle instead of two.

    Deterministic end to end: the hash is the shared md5-based
    hash64 (no RNG), the k-th minimum is a SELECTED integer, and
    the estimate is one division — bit-identical cross-engine,
    unlike engine-native approx_count_distinct implementations
    which can never be oracle-compared.

    Scale shape: one (group, hash) dedup agg, then a per-group
    ranked window over the DISTINCT relation (bounded by distinct
    count, not row count); state per group is k int64s."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("grp"), hash64(F.col(col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("r", F.row_number().over(w))
    nd = hashed.groupBy("grp").agg(F.count("*").alias("n_exact"))
    kth = ranked.where(F.col("r") == k).select("grp", F.col("h").alias("hk"))
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("hk").cast("double") / F.lit(float(1 << 60)))
    )
    return (
        nd.join(kth, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            F.round(est, 6).alias("n_kmv"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
    )


def histogram_quantile_sketch(
    events: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = 64,
) -> DataFrame:
    """Equi-width histogram quantile sketch vs exact ground truth →
    ``(event_type, p, n, est, exact, abs_err_cents)`` — the fourth
    mergeable sketch family here (HLL: register max; CMS: counter
    min; KMV: order statistics; histogram: BIN COUNTS, sum-mergeable
    like CMS, the state behind every production latency/percentile
    monitor that cannot afford the exact sort). State per group is
    ``n_bins`` int64s; shards/windows merge by adding counts.

    Estimate: locate the bin where the cumulative count crosses the
    inverse-CDF rank ceil(p·n), then interpolate INSIDE the bin with
    one integer division — bin width, bin index, rank, and offset are
    all exact integer arithmetic over cents, so the estimate is
    bit-identical cross-engine (unlike t-digest/approx_percentile,
    which an oracle can never hash-match). The exact twin runs the
    same order statistic over the same integer cents, making
    ``abs_err_cents`` the sketch's measured price — the recall-row
    discipline of the ANN family applied to quantiles.

    Scale shape: one (type, bin) hash agg with map-side combine for
    the sketch; the per-type cumulative window runs over ≤ n_bins
    rows per type. Only the exact twin sorts (the calibration path,
    same note as ``value_quantiles``)."""
    from pyspark.sql import Window

    ev = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    rng = ev.groupBy("event_type").agg(
        F.min("vc").alias("mn"),
        F.max("vc").alias("mx"),
        F.count("*").alias("n"),
    )
    # integer width: (mx-mn) div n_bins + 1 guarantees bin <= n_bins-1
    rw = rng.select(
        "event_type",
        "mn",
        "n",
        (
            F.expr(f"(mx - mn) div {n_bins}") + F.lit(1)
        ).cast("long").alias("width"),
    )
    binned = ev.join(F.broadcast(rw), "event_type").select(
        "event_type", F.expr("(vc - mn) div width").alias("bin")
    )
    hist = binned.groupBy("event_type", "bin").agg(F.count("*").alias("cnt"))
    wcum = Window.partitionBy("event_type").orderBy("bin")
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    probes = rw.select(
        "event_type",
        "mn",
        "width",
        "n",
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
    ).withColumn("t", F.ceil(F.col("p") * F.col("n")).cast("long"))
    pick = (
        cum.join(probes, "event_type")
        .where(F.col("cum") >= F.col("t"))
        .groupBy("event_type", "p", "t", "mn", "width", "n")
        .agg(
            F.min_by(F.struct("bin", "cum", "cnt"), F.col("bin")).alias("b")
        )
    )
    est_c = (
        F.col("mn")
        + F.col("b.bin") * F.col("width")
        + F.expr("(t - (b.cum - b.cnt)) * width div b.cnt")
    )
    est = pick.select("event_type", "p", "n", est_c.alias("est_c"))
    # exact twin over the SAME integer cents (ties broken by event_id
    # on both engines — ranking over raw doubles would let sub-cent
    # value differences reorder rows the cents domain collapses)
    wrank = Window.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = ev.withColumn("r", F.row_number().over(wrank))
    exact = (
        ranked.join(probes.select("event_type", "p", "t"), "event_type")
        .where(F.col("r") >= F.col("t"))
        .groupBy("event_type", "p")
        .agg(F.min("vc").alias("exact_c"))
    )
    return est.join(exact, ["event_type", "p"]).select(
        "event_type",
        "p",
        "n",
        F.round(F.col("est_c").cast("double") / 100.0, 6).alias("est"),
        F.round(F.col("exact_c").cast("double") / 100.0, 6).alias("exact"),
        F.abs(F.col("est_c") - F.col("exact_c")).cast("long").alias(
            "abs_err_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom filter (the decontamination sketch the family was missing:
# HLL counts, CMS estimates frequencies, KMV samples, the histogram
# sketches quantiles — Bloom answers MEMBERSHIP in O(m bits) with a
# measured false-positive rate and zero false negatives)
# ---------------------------------------------------------------------------

BLOOM_P = 2_147_483_647  # same 2^31−1 universal-hash modulus as MinHash


def bloom_constants(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (j, a, b) affine constants, md5-derived with a
    bloom-specific salt (independent of the MinHash family)."""
    import hashlib

    out = []
    for j in range(k):
        a = int(hashlib.md5(f"bloom:a:{j}".encode()).hexdigest()[:8], 16) % (
            BLOOM_P - 1
        ) + 1
        b = int(hashlib.md5(f"bloom:b:{j}".encode()).hexdigest()[:8], 16) % BLOOM_P
        out.append((j, a, b))
    return out


def _bloom_positions(key_hash, consts: list[tuple[int, int, int]], m_bits: int):
    """k bit positions of a 31-bit-reduced key hash: ((a·h + b) mod P)
    mod m — a·h < 2^62, overflow-free under ANSI on both engines.
    Returns list of (j, position Column)."""
    h = key_hash % BLOOM_P
    return [(j, (F.lit(a) * h + F.lit(b)) % BLOOM_P % m_bits) for j, a, b in consts]


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 7
) -> DataFrame:
    """Build the Bloom bitmap from a key set → ``(word_idx, bits)``:
    each key sets k md5-affine bit positions; positions pack into
    32-bit words via a ``bit_or`` hash agg (32, not 64, so the shift
    never touches the sign bit — DuckDB's checked ``<<`` and Spark
    agree without two's-complement caveats). m/32 rows regardless of
    key count — broadcast-sized, and the agg combines map-side, so a
    100-TB key set reduces to a constant-size filter in one pass."""
    consts = bloom_constants(k)
    h = hash64(F.col(key_col))
    pos_cols = [p for _, p in _bloom_positions(h, consts, m_bits)]
    positions = keys.select(
        F.explode(F.array(*[p.cast("long") for p in pos_cols])).alias("pos")
    )
    return (
        positions.select(
            F.expr("pos div 32").alias("word_idx"),
            # SQL expr: the DataFrame-API shiftleft only takes a
            # literal shift amount, the SQL function takes a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    id_cols: list[str],
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """Probe rows against a Bloom bitmap → ``id_cols + (bloom_hit)``:
    a row is flagged iff ALL k of its positions are set (``bool_and``
    over the k probe rows; a position whose word is absent from the
    bitmap is an automatic miss via the zero-coalesced LEFT join).
    The bitmap is broadcast — probing is one narrow explode + one
    broadcast join + one hash agg per row batch, never a shuffle of
    the key set itself."""
    consts = bloom_constants(k)
    h = hash64(F.col(key_col))
    pos_cols = [p for _, p in _bloom_positions(h, consts, m_bits)]
    probes = df.select(
        *id_cols,
        F.explode(F.array(*[p.cast("long") for p in pos_cols])).alias("pos"),
    ).select(
        *id_cols,
        F.expr("pos div 32").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    )
    joined = probes.join(F.broadcast(bitmap), "word_idx", "left").select(
        *id_cols,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0
        ).alias("hit"),
    )
    return joined.groupBy(*id_cols).agg(F.bool_and("hit").alias("bloom_hit"))


def bloom_decontam_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_mod: int = 13,
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """End-to-end Bloom decontamination with its honesty row → ONE
    row ``(n_probed, n_exact_hits, n_bloom_hits, n_false_positives,
    n_missed, false_positive_rate)``: the ``doc_id % benchmark_mod =
    0`` cohort plays the benchmark set (fingerprint = hash64 of
    normalized text), every other document probes the filter, and the
    Bloom verdict is compared against EXACT membership (a left-semi
    join on the fingerprint — what the filter approximates).
    ``n_missed`` MUST be 0 (Bloom has no false negatives — the row
    proves it); ``false_positive_rate`` is the measured counterpart
    of the (1 − e^{−kn/m})^k design number. The registry row runs TWO
    configs — design-sized (m=2¹⁶, k=7 → FPR ≈ 0, the correct
    deployment) and deliberately undersized (m=2¹⁰, k=3 → measurable
    FPR) — so the metric is demonstrated live, not just asserted.

    The 100-TB story: the exact check shuffles every fingerprint; the
    Bloom path reduces the benchmark to m/32 broadcast words and
    probes map-side — this operator measures exactly what that
    compression costs in precision."""
    from bigclam_apachespark_spark.functions.hashing import normalize_text

    fp = docs.select(
        id_col, hash64(normalize_text(text_col)).alias("fp")
    )
    bench = fp.where(F.col(id_col) % benchmark_mod == 0)
    probe = fp.where(F.col(id_col) % benchmark_mod != 0)
    bitmap = bloom_bitmap(
        bench.select(F.col("fp").cast("string").alias("key")), "key", m_bits, k
    )
    flagged = bloom_probe(
        probe.select(id_col, F.col("fp").cast("string").alias("key")),
        "key",
        bitmap,
        [id_col],
        m_bits,
        k,
    )
    exact = probe.join(
        bench.select("fp").distinct(), "fp", "left_semi"
    ).select(id_col, F.lit(True).alias("exact_hit"))
    verdicts = (
        probe.select(id_col)
        .join(flagged, id_col, "left")
        .join(exact, id_col, "left")
        .select(
            F.coalesce("bloom_hit", F.lit(False)).alias("b"),
            F.coalesce("exact_hit", F.lit(False)).alias("e"),
        )
    )
    return verdicts.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long").alias("n_exact_hits"),
        F.sum(F.when(F.col("b"), 1).otherwise(0)).cast("long").alias("n_bloom_hits"),
        F.sum(F.when(F.col("b") & ~F.col("e"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.sum(F.when(F.col("e") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n_missed"),
    ).select(
        "*",
        F.round(
            F.col("n_false_positives").cast("double")
            / (F.col("n_probed") - F.col("n_exact_hits")).cast("double"),
            6,
        ).alias("false_positive_rate"),
    )
