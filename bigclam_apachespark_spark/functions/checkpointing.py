"""Release helpers for localCheckpoint'd DataFrames.

``DataFrame.unpersist()`` only removes cacheManager entries; it does
NOT drop a local checkpoint's materialized RDD blocks. Those belong
to the internal RDD ``Dataset.checkpoint`` created (``queryExecution
.toRdd.map(_.copy())``), which is reachable only through the
``LogicalRDD`` leaf of the checkpointed plan — calling plain
``unpersist`` leaves every superseded generation resident until
ContextCleaner GC collects the RDD object, which accumulates across
long iterative loops (PageRank / k-core / BFS / the BigCLAM fit run
dozens of generations per session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpersist_local_checkpoint(df: DataFrame, blocking: bool = False) -> None:
    """Free the RDD blocks of a localCheckpoint'd DataFrame (verified
    against ``SparkContext.getPersistentRDDs``: plain
    ``Dataset.unpersist`` leaves the block registered; unpersisting
    the LogicalRDD's rdd removes it). Falls back to plain
    ``unpersist`` for plans that are not checkpoint results."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
            return
    except Exception:
        pass
    df.unpersist(blocking)


def is_local_checkpoint(df: DataFrame) -> bool:
    """True when the plan already IS a checkpoint result (LogicalRDD)
    — the guard ``ensure_local_checkpoint`` applies, exposed for
    callers that must know whether they OWN the materialization (and
    so may release it) or borrowed a shared/pooled one (r14, ADVICE
    r13 #4)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return plan.getClass().getSimpleName() == "LogicalRDD"
    except Exception:
        return False


def ensure_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` unless the plan already IS a checkpoint
    result (LogicalRDD): re-checkpointing an already-materialized
    input copies every block a second time — the double-materialize
    waste pattern when both a caller and a shared kernel defensively
    checkpoint the same relation."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return df
    except Exception:
        pass
    return df.localCheckpoint(eager=eager)


def checkpoint_fresh(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint + stats reset — THE enabler of iterative
    DataFrame loops on Spark ≥3.4 (promoted here from
    operators/bigclam.py in r11 when the SGNS fit loop hit the same
    defect).

    ``localCheckpoint`` carries the origin plan's *estimated* stats
    into the resulting LogicalRDD (SPARK-39834), and the size-only
    estimator models a join's output size as the PRODUCT of its
    children's sizes. An iterative loop that joins the checkpointed
    state back against data therefore compounds the estimate
    exponentially: measured on the 8-node fixture, sizeInBytes went
    8 → 80 → 443 → 2255 decimal DIGITS over four iterations, after
    which every plan compile burned minutes in BigInteger multiplies
    (the round-1 BigCLAM "fit cannot converge on 8 nodes" defect; the
    r11 reproduction: a minimal join-update loop on 16k rows went
    0.4 s → 85 s per step by iteration 21 under plain localCheckpoint,
    flat at ~0.1 s with the stats reset). Re-wrapping the
    checkpointed RDD via createDataFrame drops the origin stats; the
    two Row↔InternalRow conversion maps this adds are narrow,
    JVM-side, and negligible next to a checkpoint.

    When NOT to use it: the reset sets sizeInBytes to
    spark.sql.defaultSizeInBytes (Long.MaxValue), so joins against a
    fresh frame never auto-broadcast. For a BOUNDED chain (the 2-3
    step oracle queries) the inherited estimates cannot compound far
    and the broadcasts they enable win — measured at sf0.1:
    graph_sgns_two_steps is 17 s with plain localCheckpoint vs 33 s
    with the stats reset. Plain localCheckpoint for bounded unrolls;
    checkpoint_fresh for open-ended driver loops.

    Returns the fresh DataFrame with the checkpointed parent attached
    as ``_ckpt_handle`` (call ``release_fresh_checkpoint(df)`` to
    free blocks)."""
    ck = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    fresh = DataFrame(
        spark._jsparkSession.createDataFrame(ck._jdf.javaRDD(), ck._jdf.schema()),
        spark,
    )
    fresh._ckpt_handle = ck
    return fresh


def release_fresh_checkpoint(df: DataFrame) -> None:
    """Free the blocks behind a ``checkpoint_fresh`` result (no-op for
    anything else)."""
    handle = getattr(df, "_ckpt_handle", None)
    if handle is not None:
        unpersist_local_checkpoint(handle)
