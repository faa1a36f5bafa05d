"""Bucketed two-stage exact global ordering kernels.

A plain ``ROW_NUMBER() OVER (ORDER BY …)`` or ``SUM() OVER (ORDER BY
… ROWS UNBOUNDED PRECEDING)`` funnels the whole relation through ONE
task's sort — the classic 100-TB scale-killer (Spark warns
``WindowExec: No Partition Defined``). These helpers compute the
IDENTICAL answer in two exact stages:

1. every row is range-bucketed by its proportional position between
   the relation's min/max order key (one broadcast one-row bounds
   aggregate; double math is monotone, so bucket boundaries respect
   the ordering and key ties always share a bucket);
2. a per-bucket COUNT/SUM aggregate — ≤``buckets`` rows, metadata-
   sized — yields each bucket's exclusive prefix offset via a tiny
   window, and the per-row rank / running sum is offset + a window
   partitioned BY bucket, spreading the relation across ``buckets``
   tasks.

The only single-partition step left is the offsets window over
≤``buckets`` rows, ordered on the internal ``_cb`` column — which is
exactly what ``tests/test_plans.py``'s registry-wide guard allows.

``operators/text.py::cap_per_source`` / ``global_shuffle_order`` use
the same two-stage shape with a cheaper bucketing (top bits of their
own uniform order hash — no bounds pass needed); these helpers are
the generic-numeric-key form for relations ordered by a data column
(conductance, doc_id, a precomputed rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _with_pos_bucket(df: DataFrame, order_col: str, buckets: int) -> DataFrame:
    """Append ``_cb`` ∈ [0, buckets): monotone (non-strict) in the
    numeric ``order_col``, via a broadcast min/max bounds row. NULL
    order keys map to bucket 0 — min/max ignore them, and a plain
    ``Window.orderBy`` sorts NULLS FIRST, so ranking them at the
    front (before bucket 0's non-null rows, via the window's own
    NULLS FIRST within the bucket) keeps the kernel a drop-in
    replacement for the single-partition window."""
    bounds = df.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    span = F.col("_hi") - F.col("_lo")
    pos = F.when(F.col(order_col).isNull(), F.lit(0.0)).when(
        span > 0, (F.col(order_col).cast("double") - F.col("_lo")) / span
    ).otherwise(F.lit(0.0))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_cb", F.least(F.floor(pos * buckets), F.lit(buckets - 1)).cast("int")
        )
        .drop("_lo", "_hi")
    )


def _bucket_offsets(bucketed: DataFrame, value: Column) -> DataFrame:
    """(_cb, _off): exclusive prefix totals of ``value`` per bucket —
    the ≤``buckets``-row relation whose window is allowed to be
    unpartitioned."""
    off_w = Window.orderBy("_cb").rowsBetween(Window.unboundedPreceding, -1)
    return (
        bucketed.groupBy("_cb")
        .agg(F.sum(value).alias("_cnt"))
        .select(
            "_cb", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
        )
    )


def bucketed_row_number(
    df: DataFrame, order_cols: list[str], out: str = "rk", buckets: int = 64
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY order_cols)`` (1-based,
    LONG) without a single-partition sort. ``order_cols[0]`` must be
    numeric (it drives the range bucketing); remaining columns break
    ties within a bucket, so the full tuple ordering is honored
    exactly."""
    b = _with_pos_bucket(df, order_cols[0], buckets)
    offsets = _bucket_offsets(b, F.lit(1))
    rank_w = Window.partitionBy("_cb").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "_cb")
        .withColumn(
            out, (F.col("_off") + F.row_number().over(rank_w)).cast("long")
        )
        .drop("_cb", "_off")
    )


def bucketed_row_number_pair(
    df: DataFrame,
    order_cols_1: list[str],
    out1: str,
    order_cols_2: list[str],
    out2: str,
    buckets: int = 64,
) -> DataFrame:
    """TWO exact global row_numbers over the SAME relation, attached
    to every row in one chained pass (OPTIMIZATION r14, guide §2.4 —
    VERDICT r13 ask #4). Equivalent to calling ``bucketed_row_number``
    twice and joining the results on a row key, but WITHOUT the join:
    both bucket boundaries are computed from ``df`` directly (a
    bucket id is a function of the row's own order column and the
    column's min/max — independent of the other ranking), so the two
    rank windows chain as Exchange(_cb1)+sort → Exchange(_cb2)+sort
    in a single plan. vs the join formulation this removes the two
    row-count-sized Exchanges on the join key plus the join itself.
    Each ranking is bit-identical to ``bucketed_row_number`` with the
    same arguments: same bounds, same bucket function, same offsets,
    same within-bucket window ordering (``order_cols`` must make the
    ordering total — e.g. end with a unique key — for the pairing of
    the two ranks to be deterministic)."""
    o1, o2 = order_cols_1[0], order_cols_2[0]
    # ONE fused bounds row for both orderings (min/max are column
    # properties — independent of the other ranking), so the bucket
    # projection costs one broadcast and one crossJoin, not two
    # chained ones whose second recomputes the first's subplan.
    bounds = df.agg(
        F.min(o1).cast("double").alias("_lo1"),
        F.max(o1).cast("double").alias("_hi1"),
        F.min(o2).cast("double").alias("_lo2"),
        F.max(o2).cast("double").alias("_hi2"),
    )

    def cb(col: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        pos = F.when(F.col(col).isNull(), F.lit(0.0)).when(
            span > 0, (F.col(col).cast("double") - F.col(lo)) / span
        ).otherwise(F.lit(0.0))
        return F.least(F.floor(pos * buckets), F.lit(buckets - 1)).cast("int")

    b = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_cb1", cb(o1, "_lo1", "_hi1"))
        .withColumn("_cb2", cb(o2, "_lo2", "_hi2"))
        .drop("_lo1", "_hi1", "_lo2", "_hi2")
    )
    off1 = _bucket_offsets(
        b.select(F.col("_cb1").alias("_cb")), F.lit(1)
    ).select(F.col("_cb").alias("_cb1"), F.col("_off").alias("_off1"))
    off2 = _bucket_offsets(
        b.select(F.col("_cb2").alias("_cb")), F.lit(1)
    ).select(F.col("_cb").alias("_cb2"), F.col("_off").alias("_off2"))
    w1 = Window.partitionBy("_cb1").orderBy(*order_cols_1)
    w2 = Window.partitionBy("_cb2").orderBy(*order_cols_2)
    return (
        b.join(F.broadcast(off1), "_cb1")
        .join(F.broadcast(off2), "_cb2")
        .withColumn(out1, (F.col("_off1") + F.row_number().over(w1)).cast("long"))
        .withColumn(out2, (F.col("_off2") + F.row_number().over(w2)).cast("long"))
        .drop("_cb1", "_cb2", "_off1", "_off2")
    )


def bucketed_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out: str = "run_sum",
    buckets: int = 64,
) -> DataFrame:
    """Exact inclusive ``SUM(value_col) OVER (ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` (LONG) without a single-partition
    sort. Same bucketing contract as ``bucketed_row_number``."""
    b = _with_pos_bucket(df, order_cols[0], buckets)
    offsets = _bucket_offsets(b, F.col(value_col))
    run_w = (
        Window.partitionBy("_cb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offsets), "_cb")
        .withColumn(
            out,
            (F.col("_off") + F.sum(value_col).over(run_w)).cast("long"),
        )
        .drop("_cb", "_off")
    )
