"""Skew-mitigation utilities: salted equi-join and salted two-stage
aggregation.

When a join key's frequency distribution has heavy hitters (one user
with 10⁸ events, one token in every document), hash-partitioning by
the key sends the whole hot key to ONE task — the stage runs at the
speed of its slowest partition no matter how many executors exist.
AQE's skew-join splitting handles sort-merge joins after the fact;
these helpers handle the cases AQE cannot:

- ``salted_join``: a shuffled hash/sort-merge join where the build
  side is small enough to replicate ``n_salts``× but too big (or too
  dynamic) to broadcast. The probe side scatters each hot key across
  ``n_salts`` partitions; the build side is replicated to meet it.
  Results are row-identical to the plain join (asserted in tests).
- ``salted_count_distinct``: COUNT(DISTINCT x) BY key under key skew.
  A plain two-column groupBy still routes every (hot_key, *) row
  through one combiner chain per partition but one REDUCER per key;
  pre-aggregating (key, salt) first bounds any single reducer's input
  to ~1/n_salts of the hot key.

Salts are derived deterministically from row content (xxhash64), not
``rand()`` — a nondeterministic salt recomputed on task retry would
silently duplicate or drop rows (Spark may re-execute map tasks).
These helpers are physical tools: they change plan shape, never
results. Equivalence against the unsalted plans is pinned by
tests/test_skew.py, and ``salted_count_distinct`` additionally runs
under the driver's oracle gate (``events_salted_distinct`` — the
oracle is the PLAIN ``COUNT(DISTINCT)``, which is exactly the
result-identity claim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): xxhash64 over ALL
    columns — stable under task retry (unlike rand/monotonically_
    increasing_id), uniform enough to split a hot key's rows."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with the probe side's hot
    keys scattered over ``n_salts`` sub-partitions and the build side
    replicated ``n_salts``× to match.

    Use when: the build side exceeds the broadcast threshold (else
    just broadcast — that is already skew-immune) AND the probe side
    has keys hot enough to stall a task. Cost: build side shuffles
    n_salts× more rows; the probe side's per-task input bound drops
    n_salts×. Supported ``how``: inner / left (semantics preserved
    because every probe row carries exactly one salt value and every
    build row exists for all salt values).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = probe.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    p = probe.withColumn("_salt", _salt_col(probe, n_salts).cast("int"))
    b = build.crossJoin(F.broadcast(salts))
    return p.join(b, [on, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 8,
) -> DataFrame:
    """COUNT(DISTINCT value) per key, skew-safe → ``(key,
    n_distinct)``.

    Stage 1 deduplicates (key, salt(value), value) — the hot key's
    distinct set arrives at n_salts different reducers, each seeing
    ~1/n_salts of it. Stage 2 sums per-salt distinct counts (disjoint
    by construction: the salt is a function of the value, so no value
    is counted twice). Two shuffles of shrinking size instead of one
    shuffle with an unboundedly hot partition. NULL values are
    dropped up front — COUNT(DISTINCT) never counts NULL — and keys
    whose values are ALL NULL are restored with n_distinct = 0 via
    the key-spine left join, so the result stays row-identical to the
    plain aggregation (pinned by tests incl. the all-NULL case)."""
    salted = df.where(F.col(value).isNotNull()).select(
        key, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt"), value
    ).distinct()
    per_salt = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n")
    )
    counts = per_salt.groupBy(key).agg(F.sum("_n").alias("_nd"))
    keys = df.select(key).distinct()
    return keys.join(counts, key, "left").select(
        key, F.coalesce("_nd", F.lit(0)).alias("n_distinct")
    )


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin-repartition a relation whose SCAN produced far
    fewer partitions than the machine has cores, so a following
    compute-heavy narrow map (shingling, per-doc quality expressions,
    quantized-vector kernels) uses the whole machine instead of the
    scan's task count (OPTIMIZATION r14, guide §2.1 "scale-adaptive
    partitioning").

    Why this exists: a small-but-CPU-hot table (the compressed
    ``documents`` corpus is ~600 KB at sf0.1) fits a single parquet
    split, so EVERYTHING up to the first shuffle — explode to 1M+
    shingle rows, hashing, the map-side partial aggregation — ran in
    ONE task while the other 31 cores idled. At production scale the
    same table has thousands of splits and this helper is a NO-OP
    (``scan partitions >= cores`` short-circuits before any plan
    change), so it cannot pessimize the at-scale plan; the exchange
    it inserts locally moves only the tiny underpartitioned relation
    (sub-MB), far cheaper than the serial compute it unlocks
    (measured: the sf0.1 MinHash signature stage alone 4.6 s → <1 s).

    Physical tool, result-identical: round-robin repartition with
    Spark's default ``sortBeforeRepartition`` is deterministic under
    task retry, and every downstream consumer here is an
    aggregation/join/window keyed on full columns — none observes
    partitioning. Streaming inputs are returned untouched (the
    micro-batch planner owns their partitioning).

    Only SHUFFLE-FREE plans (a narrow map/filter chain over a scan)
    are eligible: if the physical plan already contains an Exchange,
    the input's parallelism is owned by that shuffle (AQE sizes it),
    and — the sharp edge — ``df.rdd`` under AQE EAGERLY EXECUTES the
    plan's query stages, so probing the partition count of a join
    subplan would run the join during query CONSTRUCTION. The guard
    checks the pre-AQE ``sparkPlan`` string (planning only, no job)
    before any ``.rdd`` access."""
    if df.isStreaming:
        return df
    if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
