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
