"""Deduplication operators over the ``documents`` table (north-star
extension surface): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design (the point of each shape):
- exact: one hash-groupBy — map-side partial agg, single shuffle.
- MinHash+LSH: shingle→perm-hash→min is explode + hash-agg (map-side
  combine keeps the shuffle at |docs|×num_perms rows, NOT
  |shingles|×num_perms); band buckets join docs only within equal
  (band, bucket) keys — candidate pairs, never the full cross join.
- SimHash: tokens × 32 bit positions → sign sums → one 32-bit key;
  near-dups join on band keys of the simhash (bit-block LSH).
- n-gram Jaccard: inverted-index self-join (token → doc pairs) with
  per-pair intersection counts — the classic |pairs-sharing-a-token|
  plan, never |docs|².
- embedding cosine: see operators/similarity.py (shared kernels).

Everything is md5-hash-based (functions/hashing.py) so DuckDB
reproduces every number bit-for-bit for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.hashing import (
    MINHASH_P,
    hash64,
    minhash_perm_constants,
    normalize_text,
    tokens,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups keyed by the 60-bit content hash of
    normalized text → ``(content_fp, n_docs, keep_doc_id)`` for groups
    with ≥2 members. ``keep_doc_id`` = min doc_id (canonical
    survivor). One shuffle (hash agg with map-side combine)."""
    return (
        docs.select(F.col("doc_id"), hash64(normalize_text(text_col)).alias("content_fp"))
        .groupBy("content_fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_docs") >= 2)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row (min doc_id) per distinct normalized text. Window-
    free formulation: min_by over the hash group — single shuffle."""
    return (
        docs.select("doc_id", hash64(normalize_text(text_col)).alias("content_fp"))
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_fp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_table(docs: DataFrame, text_col: str = "text", shingle_n: int = 5) -> DataFrame:
    """(doc_id, s): distinct char shingles per doc, built from a
    MATERIALIZED normalized-text column. Materializing matters:
    expressions inside higher-order-function lambdas are not common-
    subexpression-eliminated, so inlining normalize_text into the
    shingle transform re-runs the regex once PER SHINGLE (measured
    16 s for 1M shingles at sf0.1 → ~3 s with the projection
    boundary).

    NULL-text docs drop entirely: without the filter, substr over a
    NULL norm yields a ``[NULL]`` shingle array whose explode emits
    one spurious NULL shingle (and so a spurious signature). The
    narrow streaming formulation (``minhash_band_keys``) filters
    identically — the two must drop the same docs for their claimed
    band equality to hold.

    OPTIMIZATION r14 (guide §2.1): the input is spread across cores
    first — the compressed corpus fits one parquet split, so the
    explode to 1M+ shingle rows, the per-shingle hashing AND the
    map-side partial min-aggregation of every signature consumer all
    ran in a single task (measured 4.6 s serial for the sf0.1 wide-
    signature stage). ``spread_small_input`` is a no-op whenever the
    scan already has >= cores partitions (any at-scale table)."""
    from bigclam_apachespark_spark.functions.skew import spread_small_input

    normd = spread_small_input(docs).select(
        "doc_id", normalize_text(text_col).alias("norm")
    ).where(F.col("norm").isNotNull())
    shingles = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length("norm") - F.lit(shingle_n - 1), F.lit(1))
        ),
        lambda i: F.col("norm").substr(i, F.lit(shingle_n)),
    )
    return normd.select("doc_id", F.explode(F.array_distinct(shingles)).alias("s"))


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_perms: int = 16, shingle_n: int = 5
) -> DataFrame:
    """MinHash signature in LONG layout ``(doc_id, perm, minhash)``.

    Each shingle is md5-hashed ONCE; the num_perms permutations are
    the affine family (a_p·h + b_p) mod P over the 31-bit reduction
    (functions/hashing.py — same literals injected into the DuckDB
    twin). The explode is |shingles|×num_perms rows but the min-agg
    combines map-side, so the shuffle carries only |docs|×num_perms
    rows — the scale-critical property; the md5 count is |shingles|,
    not |shingles|×num_perms (measured 3-4× on the full pipeline).
    """
    return signatures_from_shingles(
        shingle_table(docs, text_col, shingle_n), num_perms
    )


def signatures_from_shingles(sh: DataFrame, num_perms: int = 16) -> DataFrame:
    """Signature computation over a (doc_id, s) shingle table.

    All ``num_perms`` permutation mins are computed as SEPARATE min
    aggregates in ONE groupBy pass over the shingle rows — no row
    blowup at all (the previous crossJoin×perms shape pushed
    |shingles|×num_perms rows through the partial agg; measured 5.7 s
    → 2.4 s at sf0.1 / 1M shingles / 16 perms). Map-side combine
    reduces each partition to |docs|×1 wide rows before the shuffle;
    the long (doc_id, perm, minhash) contract layout is restored by a
    cheap posexplode after the agg."""
    perms = minhash_perm_constants(num_perms)
    h = sh.select("doc_id", (hash64("s") % MINHASH_P).alias("h0"))
    mins = h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h0") + F.lit(b)) % MINHASH_P).alias(f"m{p}")
            for p, a, b in perms
        ]
    )
    return mins.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{p}") for p, _, _ in perms])).alias(
            "perm", "minhash"
        ),
    )


def lsh_buckets(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """Band the signature: ``(doc_id, band, bucket)`` where bucket =
    hash of the band's minhash values in perm order."""
    banded = signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        hash64(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            )
        ).alias("bucket")
    )


def wide_signatures_from_shingles(sh: DataFrame, num_perms: int = 16) -> DataFrame:
    """Signature in WIDE layout ``(doc_id, m0..m{num_perms-1})`` — the
    same per-doc min aggregates as ``signatures_from_shingles`` WITHOUT
    the posexplode back to long rows (OPTIMIZATION r13, guide §2.4):
    the long layout is the *contract* layout of the standalone
    ``dedup_minhash_signatures`` query, but inside ``minhash_lsh_dups``
    it only existed to feed ``lsh_buckets``'s second |docs|×num_perms
    shuffle + collect_list agg and the prefilter's per-perm join
    fan-out. Keeping the agg row wide lets both downstream consumers
    run as narrow projections (``lsh_buckets_from_wide``,
    ``signature_estimate_filter_wide``) over one |docs|-row relation."""
    perms = minhash_perm_constants(num_perms)
    h = sh.select("doc_id", (hash64("s") % MINHASH_P).alias("h0"))
    return h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h0") + F.lit(b)) % MINHASH_P).alias(f"m{p}")
            for p, a, b in perms
        ]
    )


def lsh_buckets_from_wide(
    wide: DataFrame, num_perms: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """``lsh_buckets`` computed from the wide signature row — a narrow
    posexplode over per-band hash expressions, NO second shuffle.

    Bucket-hash equality with ``lsh_buckets`` is exact by
    construction: the long form hashes ``array_join(minhash strings
    in perm order, ",")`` (the collect_list struct-sort orders by
    perm); here the band's min columns are concat_ws-joined in the
    same perm order with the same casts, so the hashed string — and
    hence every bucket id — is byte-identical (property-tested).
    When ``rows_per_band`` does not divide ``num_perms``, the long
    form's ``perm // rows_per_band`` banding leaves a PARTIAL
    trailing band from the remainder perms — emitted here the same
    way (ADVICE r13 #2: the old ``num_perms // rows_per_band`` count
    silently dropped those perms, so non-default configs diverged in
    candidate generation; property-tested at num_perms=18)."""
    n_bands = -(-num_perms // rows_per_band)  # ceil: partial band too
    band_hashes = [
        hash64(
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{p}").cast("string")
                    for p in range(
                        k * rows_per_band,
                        min((k + 1) * rows_per_band, num_perms),
                    )
                ],
            )
        )
        for k in range(n_bands)
    ]
    return wide.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band", "bucket")
    )


def signature_estimate_filter_wide(
    cand: DataFrame, wide: DataFrame, num_perms: int = 16, min_matches: int = 6
) -> DataFrame:
    """``signature_estimate_filter`` with the match count as a single
    codegen expression over the wide signature rows (OPTIMIZATION r13,
    guide §2.3 — shuffle fewer rows): the long form shipped
    |cand|×num_perms rows through TWO shuffle joins plus a hash agg
    just to count equal permutations; here each side's signature is
    attached by one equi-join on the doc id and the count is
    Σₚ int(maₚ = mbₚ) evaluated row-at-a-time in codegen. Integer
    equality on identical min values — the count is bit-identical to
    the long form's, and a pair with zero matching perms (absent from
    the long form's post-WHERE agg) is dropped here by the same
    ``>= min_matches`` cut (min_matches ≥ 1 whenever this is called)."""
    wa = wide.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"m{p}").alias(f"_ma{p}") for p in range(num_perms)],
    )
    wb = wide.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"m{p}").alias(f"_mb{p}") for p in range(num_perms)],
    )
    n_match = sum(
        F.when(F.col(f"_ma{p}") == F.col(f"_mb{p}"), 1).otherwise(0)
        for p in range(num_perms)
    )
    return (
        cand.join(wa, "a")
        .join(wb, "b")
        .where(n_match >= F.lit(min_matches))
        .select("a", "b")
    )


def minhash_band_keys(
    docs: DataFrame,
    text_col: str = "text",
    num_perms: int = 16,
    shingle_n: int = 5,
    rows_per_band: int = 4,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document LSH band keys as a pure NARROW map → ``(doc_id,
    band, bucket)`` — identical buckets to
    ``lsh_buckets(minhash_signatures(docs))`` (property-tested), but
    computed with ZERO aggregation: each permutation min is an
    ``array_min`` over the hashed shingle array instead of an
    explode + min-agg, and the band hash concatenates the mins
    positionally.

    This is the STREAMING formulation: with no stateful agg upstream
    the stream stays in append mode, and the only state is the dedup
    operator's own key store (``streaming.minhash_band_stream``).
    Batch callers keep the explode+agg shape in
    ``minhash_signatures`` — codegen runs one pass over shingle rows
    there versus ``num_perms`` array traversals here — but the two
    formulations share every constant (normalize, shingle geometry,
    hash, affine family, band hash), so their buckets are equal by
    construction."""
    perms = minhash_perm_constants(num_perms)
    n_bands = num_perms // rows_per_band
    # NULL-text docs must drop here exactly like the batch explode
    # path drops them (explode of no shingles emits nothing);
    # without the filter concat_ws would skip the NULL mins and
    # hash the empty string, emitting rows the batch twin never sees.
    keep = list(keep_cols)
    normd = docs.select(
        "doc_id", *keep, normalize_text(text_col).alias("norm")
    ).where(F.col("norm").isNotNull())
    shingles = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length("norm") - F.lit(shingle_n - 1), F.lit(1))
        ),
        lambda i: F.col("norm").substr(i, F.lit(shingle_n)),
    )
    hashed = normd.select(
        "doc_id",
        *keep,
        F.transform(
            F.array_distinct(shingles), lambda s: hash64(s) % MINHASH_P
        ).alias("h0s"),
    )
    mins = hashed.select(
        "doc_id",
        *keep,
        F.array(
            *[
                F.array_min(
                    F.transform(
                        "h0s", lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P
                    )
                )
                for _, a, b in perms
            ]
        ).alias("mins"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("mins", b * rows_per_band + r + 1).cast(
                                "string"
                            )
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return mins.select("doc_id", *keep, F.explode(bands).alias("bb")).select(
        "doc_id",
        *keep,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


# Default hot-bucket cap for the full LSH pipeline (r13): buckets
# with more members than this are excluded from pair generation.
# Sized from measurement — max bucket is 17 at sf0.01 and 195 at
# sf0.1 (cap not binding: verified results identical), 2073 at the
# 10× scale corpus where the uncapped quadratic term was 86% of all
# candidate pairs. The oracle CAND_SQL carries the same constant.
LSH_MAX_BUCKET = 256


def lsh_candidate_pairs(
    buckets: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any (band, bucket).
    The join key is (band, bucket) — only intra-bucket pairs are ever
    materialized; with balanced buckets this is the linear-ish LSH
    cost, not |docs|².

    ``max_bucket_size``: hot-bucket guard — (band, bucket) keys with
    more than this many members are EXCLUDED from pair generation.
    A degenerate bucket of m docs yields m²/2 pairs; one boilerplate-
    text bucket with 10⁶ members at web scale means 5·10¹¹ pairs from
    a single key, which no skew-join splitting can make useful. The
    cap bounds per-key work at max_bucket_size²/2; near-dup recall
    for such docs is preserved by the OTHER bands."""
    if max_bucket_size is not None:
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count("*").alias("m"))
            .where(F.col("m") <= max_bucket_size)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"])
    a = buckets.select(F.col("doc_id").alias("a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def prefilter_min_matches(
    threshold: float,
    num_perms: int = 16,
    rows_per_band: int = 4,
    max_miss: float = 0.01,
) -> int:
    """Largest ``min_matches`` for ``signature_estimate_filter`` whose
    lossy-recall miss probability at the caller's verify ``threshold``
    stays ≤ ``max_miss``.

    Conditional on sharing one band (which every LSH candidate does),
    the remaining ``num_perms − rows_per_band`` permutations match
    i.i.d. with probability j = threshold, so a true pair exactly at
    the threshold is dropped with probability
    P[Binom(num_perms − rows_per_band, j) < min_matches −
    rows_per_band]. This picks the strongest filter that keeps that
    ≤ max_miss — at the defaults: 5 for j = 0.35 (miss 0.57%, vs ~4%
    at the old fixed 6), 6 for j = 0.5, 9 for j = 0.7.

    Returns **0 when the bound is unattainable** (below threshold
    ≈ 0.32 at the defaults, even requiring ONE corroborating match
    misses > max_miss — 28% at j = 0.1): 0 means "disable the
    prefilter"; ``minhash_lsh_dups`` then skips the filter joins
    entirely and every candidate goes to exact verify, so the miss
    bound holds unconditionally instead of silently degrading at low
    thresholds. Otherwise the result is ≥ rows_per_band + 1
    (anything lower filters nothing — the shared band already
    matches). Exact binomial arithmetic, no floats in the returned
    value — the oracle SQL generators call the same function so both
    engines filter identically."""
    from math import comb

    n = num_perms - rows_per_band
    j = float(threshold)

    def miss(extra: int) -> float:  # P[Binom(n, j) < extra]
        return sum(comb(n, i) * j**i * (1 - j) ** (n - i) for i in range(extra))

    if miss(1) > max_miss:
        return 0  # even the weakest cut over-misses: disable
    extra = 1
    while extra + 1 <= n and miss(extra + 1) <= max_miss:
        extra += 1
    return rows_per_band + extra


def signature_estimate_filter(
    cand: DataFrame, sig: DataFrame, min_matches: int = 6
) -> DataFrame:
    """Drop candidate pairs whose signatures agree on fewer than
    ``min_matches`` permutations. E[match fraction] = true Jaccard.

    ``min_matches`` MUST EXCEED rows_per_band to filter anything:
    every LSH candidate already shares one full band, i.e. agrees on
    rows_per_band permutations by construction — any threshold at or
    below that is a guaranteed no-op that still pays the two joins.
    The default 6 (= 4-row bands + 2 corroborating perms) eliminates
    the single-band-fluke floor of 4×4 banding at low j before the
    expensive exact-verify join. Integer match counting —
    bit-identical across engines, mirrored in the oracle SQL.

    THE PREFILTER IS LOSSY at low Jaccard. Conditional on sharing one
    band, the other num_perms − rows_per_band permutations match
    i.i.d. with prob j, so a true pair at threshold j is dropped with
    prob P[Binom(num_perms − rows_per_band, j) < min_matches −
    rows_per_band]; at the defaults (16 perms, 4-row bands,
    min_matches=6) that is P[Binom(12, j) < 2] ≈ 4% at j = 0.35,
    0.8% at j = 0.5, ≈ 0 at j ≥ 0.7. "Zero true-pair loss" is an
    empirical sf0.1 observation at j ≥ 0.35, not a guarantee — and
    the DuckDB oracle mirrors the same deterministic filter, so the
    correctness gate cannot see this recall loss. Callers verifying
    at low thresholds should use ``prefilter_min_matches(threshold)``
    (the ``minhash_lsh_dups`` default), which caps the miss
    probability at 1% at the caller's own threshold instead of
    paying the fixed-6 ~4% silent loss at j = 0.35."""
    sa = sig.select(F.col("doc_id").alias("a"), "perm", F.col("minhash").alias("ma"))
    sb = sig.select(F.col("doc_id").alias("b"), "perm", F.col("minhash").alias("mb"))
    matches = (
        cand.join(sa, "a")
        .join(sb, ["b", "perm"])
        .where(F.col("ma") == F.col("mb"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_match"))
    )
    return matches.where(F.col("n_match") >= min_matches).select("a", "b")


def shingle_array_table(sh: DataFrame) -> DataFrame:
    """(doc_id, _ss): each doc's distinct shingle set as ONE array
    row — the verify-side relation ``shingle_jaccard`` joins per pair
    (r14). Callers that feed multiple consumers cache THIS (per-doc
    rows) instead of the long (doc_id, s) layout."""
    return sh.groupBy("doc_id").agg(F.collect_list("s").alias("_ss"))


def shingle_jaccard(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                    shingle_n: int = 5,
                    shingles: DataFrame | None = None,
                    shingle_arrays: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over distinct char-shingle sets for given
    candidate pairs → ``(a, b, jaccard)``. Pass ``shingles`` to reuse
    an already-built (cached) shingle table instead of recomputing it.

    OPTIMIZATION r14 (guide §3.1/§1.2 — the edge-support
    ``array_intersect`` lesson applied to the dedup verify): each
    doc's distinct shingle set is collected into ONE array row and
    the per-pair intersection is ``size(array_intersect(sa, sb))``
    evaluated inside codegen, replacing the inverted-index join
    (``cand ⋈ sa ⋈ (b, s)`` — |cand|·|shared shingles| joined rows
    through a (b, s)-keyed shuffle and a per-pair count agg) AND the
    separate sizes agg + two size joins (``size(arr)`` is free).
    Result-identical: the array is the same distinct shingle set, the
    intersect count is the same n_inter, and pairs with zero shared
    shingles — which the old formulation never emitted from its
    post-join agg — are dropped by the ``n_inter ≥ 1`` filter
    (verified hash-equal on the full sf0.1 candidate set). Scale
    shape: the array relation is candidate-neighborhood-sized (the
    docs appearing in ≥1 pair); AQE's runtime size check broadcasts
    it when small and falls back to a shuffled join when not —
    measured 3.7 s → 2.6 s on the 46.7k-candidate sf0.1 verify."""
    if shingle_arrays is not None:
        arrs = shingle_arrays
    else:
        sh = (
            shingles if shingles is not None
            else shingle_table(docs, text_col, shingle_n)
        )
        arrs = shingle_array_table(sh)
    aa = arrs.select(F.col("doc_id").alias("a"), F.col("_ss").alias("_sa"))
    bb = arrs.select(F.col("doc_id").alias("b"), F.col("_ss").alias("_sb"))
    return (
        pairs.join(aa, "a").join(bb, "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_inter"),
            F.size("_sa").alias("sz_a"),
            F.size("_sb").alias("sz_b"),
        )
        .where(F.col("n_inter") >= 1)
        .select(
            "a", "b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dups(
    docs: DataFrame,
    text_col: str = "text",
    num_perms: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 5,
    threshold: float = 0.7,
    max_bucket_size: int | None = LSH_MAX_BUCKET,
    est_min_matches: int | None = None,
    cache_handles: list | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs (hot-bucket cap, default ``LSH_MAX_BUCKET``) →
    signature-estimate prefilter → exact-Jaccard verify ≥ threshold.

    The cap is the DEFAULT (r13): the 10× scale corpus measured the
    uncapped pipeline quadratic IN PRACTICE, not just in principle —
    high-df boilerplate shingles (stopword runs) pin band minima, so
    documents sharing only boilerplate collide into the same buckets
    and the hot tail grows superlinearly: raw-documents candidate
    pairs went 52k (sf0.1, max bucket 195) → 24.0M (10×, max bucket
    2073), a 463× pair blowup for 10× docs that stalled the slope
    sweep. cap=256 is not binding at the verified scales (so every
    oracle hash is unchanged) and removes 20.6M of the 24.0M pairs at
    10×; the residual mid-size-bucket candidates are boilerplate
    collisions with tiny true Jaccard, killed by the signature
    prefilter before any shingle verify. Pass ``None`` to uncap.

    ``est_min_matches``: None (default) = threshold-scaled via
    ``prefilter_min_matches(threshold, num_perms, rows_per_band)``,
    so low-threshold callers keep the prefilter's miss probability
    ≤ 1% instead of the fixed-6 ~4% loss at j = 0.35; pass an int to
    override, or 0 to disable the prefilter.

    ``cache_handles``: pass a list to receive the three internally
    cached DataFrames (signatures, surviving candidates, candidate
    shingles); the caller unpersists them once the result is
    consumed — deterministic release for long sessions interleaving
    many pipelines.

    Cache discipline (measured at sf0.1): cache the signatures
    (|docs|×num_perms rows — tiny), the surviving candidate pairs,
    and the CANDIDATE-RESTRICTED shingle table. Caching the full
    corpus shingle table costs more to materialize than two recomputes
    (1M+ string rows through the block store), but the verify pass
    re-shingles only docs appearing in a surviving pair (left_semi
    restriction — a few % of the corpus at realistic dup rates), uses
    that small table THREE times (sizes + both join sides), and
    caching it cut the end-to-end pipeline 23 s → 16 s at sf0.1. At
    100 TB the same holds: the cached set is the near-dup cluster
    neighborhood, not the corpus. Without ``cache_handles``, repeated
    invocations in one session rely on LRU eviction."""
    # Wide-signature path (OPTIMIZATION r13): one |docs|-row agg
    # relation feeds banding AND the prefilter as narrow projections —
    # the long (doc_id, perm, minhash) layout cost a second
    # |docs|×num_perms shuffle (lsh_buckets' collect_list agg) plus a
    # |cand|×num_perms join fan-out (the per-perm match count). Bucket
    # ids and match counts are bit-identical (see the helpers'
    # docstrings; property-tested), so the result set cannot move.
    # OPTIMIZATION r14 (guide §2.1): spread the corpus across cores
    # ONCE at pipeline entry — the signature build AND the candidate
    # re-shingle (docs_cand inherits this partitioning through the
    # semi-join) were serial on a single-split input. No-op at scale.
    from bigclam_apachespark_spark.functions.skew import spread_small_input

    docs = spread_small_input(docs)
    sig = wide_signatures_from_shingles(
        shingle_table(docs, text_col, shingle_n), num_perms
    ).cache()
    cand = lsh_candidate_pairs(
        lsh_buckets_from_wide(sig, num_perms, rows_per_band), max_bucket_size
    )
    if est_min_matches is None:
        est_min_matches = prefilter_min_matches(threshold, num_perms, rows_per_band)
    if est_min_matches:
        cand = signature_estimate_filter_wide(cand, sig, num_perms, est_min_matches)
    cand = cand.cache()
    cand_ids = (
        cand.select(F.col("a").alias("doc_id"))
        .union(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    docs_cand = docs.join(cand_ids, "doc_id", "left_semi")
    # r14: the verify consumes per-doc shingle ARRAYS (shingle_jaccard
    # array_intersect form) from both join sides — cache the array
    # table (one row per candidate doc) instead of the long (doc_id,
    # s) layout it derives from, so the shingle scan+agg runs once.
    arrs_cand = shingle_array_table(
        shingle_table(docs_cand, text_col, shingle_n)
    ).cache()
    if cache_handles is not None:
        cache_handles += [sig, cand, arrs_cand]
    return shingle_jaccard(
        docs_cand, cand, text_col, shingle_n, shingle_arrays=arrs_cand
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct word tokens → ``(doc_id, simhash)``.

    bit b of token t's 60-bit hash votes +1/−1; simhash bit b is set
    iff the vote sum > 0. Long layout (doc × bit) keeps the agg
    map-side-combining; 32× row blowup pre-combine only.
    """
    tok = docs.select("doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("t"))
    tok = tok.select("doc_id", hash64("t").alias("h"))
    bits = tok.sparkSession.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("b"))
    votes = (
        tok.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "b",
            # SQL-expr form: F.shiftright only takes a Python int for
            # numBits, but the SQL function accepts a column shift.
            F.when(F.expr("shiftright(h, b)").bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias("v"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("v").alias("votes"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("votes") > 0, F.expr("shiftleft(1L, b)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Block-LSH join: split the 32-bit key into 4 byte-blocks; pairs
    within Hamming ≤ 3 share at least one identical block (pigeonhole)
    — join per block, then verify exact Hamming via bit_count(xor).
    Never |docs|².
    """
    sh = simhash(docs, text_col)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a = blocks.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"), "blk", "key")
    b = blocks.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"), "blk", "key")
    return (
        a.join(b, ["blk", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# N-gram (word) Jaccard — inverted-index formulation
# ---------------------------------------------------------------------------


def token_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        threshold: float = 0.5,
                        max_df: int | None = None,
                        ngram: int = 1,
                        cache_handles: list | None = None) -> DataFrame:
    """All pairs with word-token-set Jaccard ≥ threshold, via the
    inverted index: only pairs sharing ≥1 token are ever formed.

    ``ngram``: unit size — 1 compares word sets, n>1 compares word
    n-gram sets (order-sensitive near-dup detection: shuffled text
    keeps unigram Jaccard but loses its n-grams). Documents with
    < n words have no n-grams and drop out of pair generation.

    ``max_df``: hot-token cap. Candidate generation excludes tokens
    whose document frequency exceeds max_df (candidate count is
    Σ_token df², so one stopword-like token with df=10⁷ alone yields
    5·10¹³ pairs); the Jaccard VALUE for surviving candidates is still
    exact — the intersection recount below runs over the FULL token
    sets. Only pairs whose every shared token is hot are missed, and
    such pairs are overwhelmingly low-jaccard boilerplate at scale.

    The exploded token table feeds 4-8 subplans (sizes, both join
    sides, df counts); it is CACHED so the corpus is scanned and
    tokenized once, not once per consumer (measured 8 scans → 1 at the
    bigram setting). ``cache_handles``: pass a list to receive the
    handle for deterministic release; otherwise LRU eviction applies."""
    from bigclam_apachespark_spark.functions.hashing import word_ngrams_of

    if ngram == 1:
        tok = docs.select(
            "doc_id", F.explode(F.array_distinct(tokens(text_col))).alias("t")
        ).cache()
    else:
        # tokens staged first (see word_ngrams_of: no CSE across
        # lambda boundaries — inlining re-tokenizes per gram).
        tok = (
            docs.select("doc_id", tokens(text_col).alias("tk"))
            .select(
                "doc_id",
                F.explode(F.array_distinct(word_ngrams_of(F.col("tk"), ngram))).alias("t"),
            )
            .cache()
        )
    if cache_handles is not None:
        cache_handles.append(tok)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if max_df is not None:
        ok_t = (
            tok.groupBy("t").agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("t")
        )
        idx = tok.join(ok_t, "t")
        cand = (
            idx.select(F.col("doc_id").alias("a"), "t")
            .join(idx.select(F.col("doc_id").alias("b"), "t"), "t")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        # exact intersection over FULL token sets, restricted to cand
        sa = tok.select(F.col("doc_id").alias("a"), "t")
        sb = tok.select(F.col("doc_id").alias("b"), "t")
        inter = (
            cand.join(sa, "a")
            .join(sb, ["b", "t"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        ta = tok.select(F.col("doc_id").alias("a"), "t")
        tb = tok.select(F.col("doc_id").alias("b"), "t")
        inter = (
            ta.join(tb, "t")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_inter"))
        )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "a").join(zb, "b")
        .select(
            "a", "b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components) + survivor election
# ---------------------------------------------------------------------------


def near_dup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over an undirected near-dup pair set →
    ``(doc_id, cluster_id)`` with cluster_id = the component's minimum
    doc_id. The stage every dedup pipeline needs after pair
    generation: pairwise matches chain (A≈B, B≈C but A̸≈C), so
    survivor election must run per CLUSTER, not per pair.

    Algorithm: iterative min-label propagation with pointer jumping.
    Each round every node takes the min of its own label, its
    neighbors' labels, AND its label's label (path doubling) — the
    doubling step turns the worst case from O(diameter) rounds into
    O(log n), which is what makes this viable at 100 TB where a
    pathological chain of pairwise-similar boilerplate docs can be
    millions long. Each round is two joins + one agg; labels are
    localCheckpoint'd per round to stop lineage growth, and the loop
    exits on a converged round (changed == 0 — one count action per
    round, the only driver traffic).

    The reference has no analog (its community structure comes from
    BigCLAM itself); this is extension surface for the LLM-data
    pipeline (SURVEY.md §2.G)."""
    # r14 (guide §3.1): the label table's row count is FIXED across
    # rounds (the pair-touched vertex set), so one count up front
    # gates a broadcast hint for every label-sized join side below —
    # checkpointed label generations otherwise carry garbage size
    # estimates (SPARK-39834) and the rounds sort-merge. Above the
    # ceiling the shuffled joins remain the at-scale shape.
    from bigclam_apachespark_spark.operators.graph import (
        FRONTIER_BCAST_MAX_ROWS,
    )

    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().select("u", F.col("u").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    hint = (
        F.broadcast
        if labels.count() <= FRONTIER_BCAST_MAX_ROWS
        else (lambda d: d)
    )
    prev_gen = labels
    for _ in range(max_iter):
        nbr_min = (
            sym.join(hint(labels.select(F.col("u").alias("v"), "lbl")), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # Carry the round's starting label through as ``old`` so the
        # convergence count below is a scan of the checkpointed
        # generation instead of an extra labels⋈new_labels join per
        # round (OPTIMIZATION r13 — same values, one less join).
        stepped = labels.join(hint(nbr_min), "u", "left").select(
            "u",
            F.col("lbl").alias("old"),
            F.least("lbl", F.coalesce("nbr_lbl", F.col("lbl"))).alias("lbl"),
        )
        # pointer jumping: label(u) <- label(label(u))
        jumped = stepped.join(
            hint(
                stepped.select(
                    F.col("u").alias("lbl"), F.col("lbl").alias("lbl2")
                )
            ),
            "lbl",
            "left",
        ).select("u", "old", F.coalesce("lbl2", F.col("lbl")).alias("lbl"))
        new_labels = jumped.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("old") != F.col("lbl")).count()
        prev_gen.unpersist()
        prev_gen = new_labels
        labels = new_labels.select("u", "lbl")
        if changed == 0:
            break
    out = labels.select("u", "lbl")
    sym.unpersist()
    return out.select(F.col("u").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def cluster_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Corpus-wide survivor election over near-dup clusters →
    ``(doc_id, cluster_id, keep)``: every document joins its connected
    component (docs in no pair form singleton clusters), and exactly
    one document per cluster — the minimum doc_id — carries keep = 1.
    Because min-label components label every member with the
    component's minimum id, the survivor test is simply
    doc_id == cluster_id (no second aggregation).

    Scale shape: the cluster label table covers only docs appearing in
    ≥1 pair (a few % of a real corpus), so the docs-side join is a
    left join against a small (often broadcastable) table; the corpus
    itself never shuffles."""
    clusters = near_dup_clusters(pairs)
    return docs.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        F.when(F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id"), 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
    )


def cross_corpus_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    num_perms: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus decontamination → ``(doc_id, bench_id, jaccard)``:
    training documents whose shingle-set Jaccard against some
    BENCHMARK document reaches ``threshold`` — the canonical
    "remove the eval set from the training corpus" check. Same
    MinHash-LSH machinery as intra-corpus dedup, but candidates are
    only CROSS pairs (train × benchmark sharing a band bucket) — the
    train×train and bench×bench quadrants are never formed.

    Scale shape: the benchmark corpus is tiny next to the training
    corpus, so its signature/band table broadcasts; the training
    corpus streams through one signature pass and one band-key probe.
    Verification re-shingles only candidate documents (both sides
    restricted by semi-joins)."""
    sig_a = signatures_from_shingles(
        shingle_table(docs, text_col, shingle_n), num_perms
    )
    sig_b = signatures_from_shingles(
        shingle_table(benchmark, text_col, shingle_n), num_perms
    )
    ba = lsh_buckets(sig_a, rows_per_band)
    bb = lsh_buckets(sig_b, rows_per_band)
    cand = (
        ba.select(F.col("doc_id").alias("doc_id"), "band", "bucket")
        .join(
            F.broadcast(
                bb.select(F.col("doc_id").alias("bench_id"), "band", "bucket")
            ),
            ["band", "bucket"],
        )
        .select("doc_id", "bench_id")
        .distinct()
    )
    sh_a = shingle_table(
        docs.join(cand.select("doc_id").distinct(), "doc_id", "left_semi"),
        text_col,
        shingle_n,
    )
    sh_b = shingle_table(
        benchmark.join(
            cand.select(F.col("bench_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        text_col,
        shingle_n,
    )
    sizes_a = sh_a.groupBy("doc_id").agg(F.count("*").alias("sz_a"))
    sizes_b = sh_b.groupBy("doc_id").agg(F.count("*").alias("sz_b"))
    inter = (
        cand.join(sh_a, "doc_id")
        .join(
            sh_b.select(F.col("doc_id").alias("bench_id"), "s"),
            ["bench_id", "s"],
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes_a, "doc_id")
        .join(sizes_b.select(F.col("doc_id").alias("bench_id"), "sz_b"), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_decontamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram decontamination (the GPT-3/PaLM "13-gram
    overlap" family, n configurable) → ``(doc_id, bench_id, n_shared,
    bench_frac)``: training documents sharing ≥ ``min_shared`` exact
    n-grams with a benchmark document, with bench_frac = shared /
    benchmark's distinct n-grams (the fraction of the eval doc that
    is contaminated). Complements ``cross_corpus_contamination``
    (MinHash near-dup): exact n-gram hits catch verbatim quotation of
    eval items inside otherwise-unrelated training docs, which
    set-level Jaccard dilutes below any threshold.

    Exactness: n-grams are md5-hashed (hash64) before the join — the
    hashed value is the join key AND the count unit on both engines,
    so the metric is integer-exact; bench_frac is one IEEE division,
    rounded at 6.

    Scale shape: benchmark corpora are tiny next to training corpora
    — the benchmark gram table broadcasts and the training corpus
    streams through one explode + one broadcast-join + one hash-agg;
    the train×train quadrant is never formed. ``max_df`` optionally
    drops training grams whose corpus df exceeds the cap (boilerplate
    n-grams at 100 TB inflate the join fan-out; capped grams can only
    lower n_shared for boilerplate-only pairs — mirrored by the
    oracle, so the gate semantics stay exact)."""
    from bigclam_apachespark_spark.functions.hashing import (
        hash64,
        tokens,
        word_ngrams_of,
    )

    def _grams(df):
        # tokens staged in their own projection: building n-grams from
        # an inlined tokens(text) re-tokenizes per gram inside the
        # transform lambda (no CSE across lambda boundaries).
        return df.select("doc_id", tokens(text_col).alias("tk")).select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams_of(F.col("tk"), n))).alias("gram"),
        )

    g_t = _grams(train).select("doc_id", hash64("gram").alias("g"))
    if max_df is not None:
        ok = (
            g_t.groupBy("g").agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("g")
        )
        g_t = g_t.join(ok, "g")
    g_b = _grams(benchmark).select(
        F.col("doc_id").alias("bench_id"), hash64("gram").alias("g")
    )
    sizes_b = g_b.groupBy("bench_id").agg(F.count("*").alias("sz_b"))
    shared = (
        g_t.join(F.broadcast(g_b), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return shared.join(F.broadcast(sizes_b), "bench_id").select(
        "doc_id",
        "bench_id",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("sz_b"), 6).alias("bench_frac"),
    )


def ngram_span_decontam(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 4,
    min_span_tokens: int = 8,
) -> DataFrame:
    """Exact SHARED-SPAN decontamination (the "deduplicating training
    data" span family) → ``(doc_id, bench_id, max_span_tokens,
    n_spans)``: for each (train, benchmark) document pair, the
    maximal CONTIGUOUS token spans they share, found from positional
    k-gram anchors merged by the gaps-and-islands trick. Complements
    ``ngram_decontamination`` (set-count overlap): a count of shared
    grams cannot distinguish 20 scattered boilerplate grams from one
    verbatim 23-token quotation of an eval item — span length can.

    Mechanics (all integer-exact, both engines): a shared span of m
    contiguous tokens produces m − k + 1 positional gram matches on
    one DIAGONAL (pos_train − pos_bench constant); within a diagonal,
    consecutive positions satisfy pos − row_number() = constant, so
    one window + one group-by recovers each maximal run r and
    span_tokens = r + k − 1. Only spans ≥ ``min_span_tokens`` are
    reported.

    Scale shape: the benchmark's positional gram table broadcasts
    (eval corpora are tiny); the training corpus streams through one
    explode + broadcast-join; the islands window partitions by
    (doc, bench, diag) — match-table-sized, never corpus-sized; the
    train×train quadrant is never formed."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.hashing import (
        hash64,
        tokens,
        word_ngrams_of,
    )

    def _pos_grams(df, idc):
        # positional (not distinct'd) grams: word_ngrams_of preserves
        # token order, so posexplode's index IS the span position
        return (
            df.select(F.col("doc_id").alias(idc), tokens(text_col).alias("tk"))
            .select(idc, F.posexplode(word_ngrams_of(F.col("tk"), k)).alias("pos", "gram"))
            .select(idc, "pos", hash64("gram").alias("g"))
        )

    t = _pos_grams(train, "doc_id")
    b = _pos_grams(benchmark, "bench_id").select(
        "bench_id", F.col("pos").alias("pos_b"), "g"
    )
    m = t.join(F.broadcast(b), "g").select(
        "doc_id", "bench_id", (F.col("pos") - F.col("pos_b")).alias("diag"), "pos"
    )
    w = Window.partitionBy("doc_id", "bench_id", "diag").orderBy("pos")
    runs = (
        m.withColumn("isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "bench_id", "diag", "isl")
        .agg((F.count("*") + k - 1).alias("span_tokens"))
        .where(F.col("span_tokens") >= min_span_tokens)
    )
    return runs.groupBy("doc_id", "bench_id").agg(
        F.max("span_tokens").cast("int").alias("max_span_tokens"),
        F.count("*").cast("int").alias("n_spans"),
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """WITHIN-corpus duplicated-span scrubbing (the ExactSubstr-style
    "deduplicating training data" pass, k-gram formulation) →
    ``(doc_id, n_tokens, n_tokens_kept, n_tokens_removed,
    text_scrubbed)``: any ``k``-token span whose exact (normalized)
    content occurs at MORE than one position in the corpus is removed
    from every position except the canonical first occurrence
    (global min (doc_id, pos)); the surviving tokens rejoin in order.
    Complements ``ngram_span_decontam`` (train-vs-benchmark REPORT):
    this one REWRITES the training corpus itself, the memorization-
    reduction step an LLM data pipeline runs corpus-wide.

    Semantics (one pass, deterministic): drop-set = union of the
    [pos, pos+k) windows of every non-canonical duplicated gram;
    overlapping duplicated spans union naturally, and a canonical
    occurrence's tokens survive unless some OTHER duplicated span's
    window covers them. One pass, not a fixpoint: rejoined text can
    form new k-grams a second pass would catch — the standard
    trade-off in this family.

    Scale shape: positional gram hashing is one narrow pass over the
    token arrays; the occurrence stats are ONE hash agg on the gram
    hash (map-side combined) filtered to duplicated grams (a small
    fraction of any real corpus) before the join back, so the
    re-join's build side is duplicate-proportional, not
    corpus-proportional; the k-position fan-out is bounded by k; the
    final rebuild groups each doc's kept tokens (per-doc groups —
    AQE-splittable only across docs, which is the natural unit). No
    window touches a corpus-sized relation."""
    from bigclam_apachespark_spark.functions.hashing import (
        hash64,
        tokens,
        word_ngrams_of,
    )

    toks = docs.select("doc_id", tokens(text_col).alias("tk"))
    occ = toks.select(
        "doc_id", F.posexplode(word_ngrams_of(F.col("tk"), k)).alias("pos", "gram")
    ).select("doc_id", "pos", hash64("gram").alias("g"))
    stats = (
        occ.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.min(F.struct("doc_id", "pos")).alias("canon"),
        )
        .where(F.col("n") >= 2)
    )
    dup = occ.join(stats, "g").where(
        ~(
            (F.col("doc_id") == F.col("canon.doc_id"))
            & (F.col("pos") == F.col("canon.pos"))
        )
    )
    drop_pos = dup.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p"),
    ).distinct()
    tok_pos = toks.select("doc_id", F.posexplode("tk").alias("p", "tok"))
    kept = tok_pos.join(drop_pos, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_scrubbed"),
    )
    base = toks.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
        (
            F.col("n_tokens") - F.coalesce("n_tokens_kept", F.lit(0))
        ).cast("long").alias("n_tokens_removed"),
        F.coalesce("text_scrubbed", F.lit("")).alias("text_scrubbed"),
    )


def ppjoin_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    ngram: int = 1,
) -> DataFrame:
    """Exact set-similarity join with PREFIX FILTERING (the
    PPJoin candidate rule, Xiao et al. WWW'08) → every pair with
    token-set Jaccard ≥ num/den as ``(a, b, inter, sz_a, sz_b,
    jaccard)``. LOSSLESS pruning — and the oracle PROVES it: the
    DuckDB twin computes the unpruned all-pairs τ-join, so a hash
    match certifies that prefix filtering dropped no qualifying pair.

    The rule: order every document's tokens canonically by global
    (df ASC, token) — rare-first — and keep only the first
    ``p = sz − ceil(τ·sz) + 1`` as its PREFIX; any pair with
    J ≥ τ must share a prefix token (pigeonhole: J ≥ τ forces
    overlap ≥ ceil(τ·sz) on each side, which cannot fit entirely in
    the sz − p = ceil(τ·sz) − 1 suffix tokens). Candidates are pairs
    sharing a prefix token; each is verified by an exact integer
    intersection over the FULL token sets, and the τ test is the
    integer cross-multiply ``den·inter ≥ num·(sz_a + sz_b − inter)``
    — no float touches the decision.

    vs ``token_jaccard_pairs``' df cap: the cap is a lossy heuristic
    (pairs whose every shared token is hot are missed); the prefix
    filter is the principled replacement — candidate volume is
    Σ_token df_prefix², and the rare-first order pushes hot tokens
    OUT of prefixes, so the hot-token blowup never forms while
    recall stays exactly 1.

    Scale shape: df is vocabulary-sized; the global token rank uses
    the bucketed two-stage row_number (no single-partition sort);
    the per-doc prefix selection is a degree-bounded window; verify
    joins touch only candidate pairs. The exploded token relation
    feeds prefix + both verify sides and is cached with a release
    handle.

    ``ngram``: the set universe — 1 = word sets; n > 1 = word n-gram
    sets. Prefix filtering's pruning power is df-driven, so on a
    SMALL-VOCABULARY corpus (this repo's synthetic word soup: ~30
    distinct words, every token hot) unigram prefixes prune nothing
    — measured 104 s at sf0.1 — while trigram sets (universe ~v³,
    df ~ 1/v² of corpus) restore the rare-first prefix's whole
    point. Real corpora are Zipfian: most tokens are rare, unigram
    prefixes prune fine; the gate config uses n=3 to demonstrate the
    algorithm under its intended statistics."""
    from bigclam_apachespark_spark.functions.hashing import word_ngrams_of
    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number
    from pyspark.sql import Window

    if ngram == 1:
        tok = docs.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(text_col))).alias("t"),
        ).cache()
    else:
        tok = (
            docs.select("doc_id", tokens(text_col).alias("tk"))
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(word_ngrams_of(F.col("tk"), ngram))
                ).alias("t"),
            )
            .cache()
        )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = tok.groupBy("t").agg(F.count("*").alias("dfr"))
    ranked = bucketed_row_number(dfreq, ["dfr", "t"], out="rk")
    # prefix length: p = sz - ceil(num*sz/den) + 1, all integer
    p = (
        F.col("sz")
        - F.floor(
            (F.lit(threshold_num) * F.col("sz") + threshold_den - 1)
            / threshold_den
        )
        + 1
    )
    wdoc = Window.partitionBy("doc_id").orderBy("rk")
    prefix = (
        tok.join(ranked.select("t", "rk"), "t")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(wdoc))
        .where(F.col("pos") <= p)
        .select("doc_id", "t")
    )
    cand = (
        prefix.select(F.col("doc_id").alias("a"), "t")
        .join(prefix.select(F.col("doc_id").alias("b"), "t"), "t")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    inter = (
        cand.join(tok.select(F.col("doc_id").alias("a"), "t"), "a")
        .join(tok.select(F.col("doc_id").alias("b"), "t"), ["b", "t"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .where(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num)
            * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    out._cache_handles = [tok]
    return out


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold_num: int = 4,
    threshold_den: int = 5,
    ngram: int = 3,
) -> DataFrame:
    """DIRECTED containment join → every ordered pair (a, b), a ≠ b,
    with ``|A ∩ B| / |A| ≥ num/den`` as ``(a, b, inter, sz_a, sz_b,
    containment)`` — the subset-duplication detector (a page embedded
    inside a larger page keeps near-total containment while its
    JACCARD can be arbitrarily low; boilerplate-wrapped copies are
    exactly this shape, which is why symmetric near-dup passes miss
    them). Same lossless-pruning posture as ``ppjoin_pairs``: a's
    PREFIX (its ``sz_a − ceil(τ·sz_a) + 1`` rarest tokens in the
    global df-canonical order) must intersect b's FULL token set —
    pigeonhole on the required overlap ceil(τ·sz_a) — and the oracle
    computes the UNPRUNED all-pairs containment join, so the hash
    match certifies zero missed pairs. The τ decision is the integer
    cross-multiply ``den·inter ≥ num·sz_a``.

    Scale shape: candidate volume is Σ_token df_prefix(t)·df(t) —
    the rare-first order keeps prefix dfs tiny; the probe side is
    the full inverted index (one relation, already built for
    verification). Token sets are word n-grams (gate n=3 — the
    synthetic corpus's tiny word vocabulary, see ``ppjoin_pairs``)."""
    from bigclam_apachespark_spark.functions.hashing import word_ngrams_of
    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number
    from pyspark.sql import Window

    if ngram == 1:
        tok = docs.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(text_col))).alias("t"),
        ).cache()
    else:
        tok = (
            docs.select("doc_id", tokens(text_col).alias("tk"))
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(word_ngrams_of(F.col("tk"), ngram))
                ).alias("t"),
            )
            .cache()
        )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = tok.groupBy("t").agg(F.count("*").alias("dfr"))
    ranked = bucketed_row_number(dfreq, ["dfr", "t"], out="rk")
    p = (
        F.col("sz")
        - F.floor(
            (F.lit(threshold_num) * F.col("sz") + threshold_den - 1)
            / threshold_den
        )
        + 1
    )
    wdoc = Window.partitionBy("doc_id").orderBy("rk")
    prefix = (
        tok.join(ranked.select("t", "rk"), "t")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(wdoc))
        .where(F.col("pos") <= p)
        .select("doc_id", "t")
    )
    cand = (
        prefix.select(F.col("doc_id").alias("a"), "t")
        .join(tok.select(F.col("doc_id").alias("b"), "t"), "t")
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    inter = (
        cand.join(tok.select(F.col("doc_id").alias("a"), "t"), "a")
        .join(tok.select(F.col("doc_id").alias("b"), "t"), ["b", "t"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a")), "a"
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b")), "b"
        )
        .where(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("sz_a")
        )
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
            F.round(
                F.col("inter").cast("double") / F.col("sz_a").cast("double"), 6
            ).alias("containment"),
        )
    )
    out._cache_handles = [tok]
    return out
