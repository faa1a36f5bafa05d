"""Temporal join operators the DataFrame API lacks as primitives:
backward as-of join and bounded range join (north-star extension;
the reference has no temporal operators of any kind — SURVEY.md §2
"not present": the only non-equi join in `codes/` is a cartesian).

Both are compositions of built-in operators chosen for the 100-TB
shape, not row-at-a-time UDFs:

- ``as_of_join``: the union-sort formulation — tag both inputs, union,
  one shuffle on the key, one per-partition sort, then
  ``last(..., ignorenulls)`` over a running window carries the most
  recent right-side row forward into each left row. Cost is
  sort-shuffle of |L|+|R| rows; there is NO join fan-out at all, which
  is why this beats the naive inequality join (|L|·|R| per key) that
  an optimizer would otherwise produce. Same shape as a sorted
  ``merge_asof`` / Flink temporal join, expressed in pure Catalyst
  operators (whole-stage codegen applies; skew bounded by per-key row
  counts, AQE-splittable).

- ``range_join``: equi-join on (key, time-bin) with bin width equal to
  the range span, so every qualifying pair co-locates in the left
  row's bin or the one before it — the standard binning rewrite that
  turns an unbounded inequality join into 2 bounded equi-join probes
  per left row, then an exact range filter. Candidate volume is
  Σ_bin |L_bin|·|R_bin| instead of Σ_key |L_key|·|R_key|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from bigclam_apachespark_spark.functions.timeutil import epoch_micros as _micros


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    right_tie: str | None = None,
    prefix: str = "asof_",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the
    latest right row with ``right_ts <= left_ts`` for the same ``on``
    key (NULLs when no such row — left-outer semantics).

    Ties: right rows sharing the maximal timestamp are resolved to the
    greatest ``right_tie`` value — or, when no tie column is given, to
    the greatest payload struct (field-order comparison) — so the
    result is deterministic and cross-engine-stable either way. A
    right row timestamped exactly at ``left_ts`` DOES match (the
    union sort places right before left at equal timestamps).

    ``tolerance_sec`` nulls out matches older than the horizon — the
    bounded-staleness variant (merge_asof's ``tolerance``).
    """
    payload = payload or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    rp = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        # Constant _tie would leave equal-timestamp right rows in
        # arbitrary shuffle order under last() — tie-break on the
        # payload struct itself when no explicit column is given.
        (F.col(right_tie) if right_tie else rp).alias("_tie"),
        rp.alias("_rp"),
    )
    rp_type = r.schema["_rp"].dataType
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(rp_type).alias("_rp"),
        F.struct(*left.columns).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.select(*l.columns))
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance_sec is not None:
        # Dispatch epoch extraction on EACH side's own dtype: _t came
        # from the left column, _m._rts from the right one, and the two
        # may carry different timestamp flavors (NTZ vs LTZ).
        l_type = left.schema[left_ts].dataType.typeName()
        r_type = right.schema[right_ts].dataType.typeName()
        horizon = int(tolerance_sec * 1_000_000)
        fresh = (
            _micros(F.col("_t"), l_type) - _micros(F.col("_m._rts"), r_type)
        ) <= horizon
        matched = matched.withColumn(
            "_m", F.when(fresh, F.col("_m"))  # else NULL
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload)
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_sec: int = 3600,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs of the bounded range join: left rows matched to
    right rows with ``right_ts ∈ [left_ts − window_sec, left_ts]`` on
    the same key. INNER semantics — aggregate and re-join to the left
    table for left-outer counts (see ``click_window_stats``).

    Returns left's columns plus ``right_cols`` (default: right's
    timestamp only, aliased ``r_<ts>``).
    """
    right_cols = right_cols if right_cols is not None else []
    span = F.lit(window_sec * 1_000_000).cast("long")
    l_type = left.schema[left_ts].dataType.typeName()
    r_type = right.schema[right_ts].dataType.typeName()

    lb = left.withColumn(
        "_bin", (_micros(F.col(left_ts), l_type) / span).cast("long")
    )
    l2 = lb.select(
        "*", F.explode(F.array(F.col("_bin"), F.col("_bin") - 1)).alias("_jbin")
    ).drop("_bin")
    rb = right.select(
        *on,
        F.col(right_ts).alias("_rts"),
        *right_cols,
        (_micros(F.col(right_ts), r_type) / span).cast("long").alias("_jbin"),
    )
    joined = l2.join(rb, [*on, "_jbin"]).where(
        (_micros(F.col("_rts"), r_type) <= _micros(F.col(left_ts), l_type))
        & (
            _micros(F.col("_rts"), r_type)
            >= _micros(F.col(left_ts), l_type) - span
        )
    )
    return joined.drop("_jbin").withColumnRenamed("_rts", f"r_{right_ts}")


# ---------------------------------------------------------------------------
# Events-table wrappers (the driver queries)
# ---------------------------------------------------------------------------


def click_attribution(events: DataFrame) -> DataFrame:
    """Last-touch click attribution: each ``purchase`` event joined
    as-of to the same user's most recent prior ``click`` →
    ``(purchase_id, user_id, purchase_ts, click_ts, click_id,
    gap_us)``. Purchases with no prior click keep NULLs. gap in
    integer microseconds (bit-exact across engines)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = as_of_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        payload=["click_id"],
        right_tie="click_id",
        prefix="c_",
    )
    ts_type = events.schema["ts"].dataType.typeName()
    return j.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("c_ts").alias("click_ts"),
        F.col("c_click_id").alias("click_id"),
        (
            _micros(F.col("purchase_ts"), ts_type)
            - _micros(F.col("c_ts"), ts_type)
        ).alias("gap_us"),
    )


def click_window_stats(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Attribution-window range join: per purchase, count and value-sum
    of the same user's clicks within the closed window
    ``[purchase_ts − W, purchase_ts]`` → ``(purchase_id, user_id,
    purchase_ts, n_clicks, sum_click_value)``. Zero-click purchases
    are kept (left-outer via re-join after the inner range join)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        window_sec=window_minutes * 60,
        right_cols=["value"],
    )
    stats = pairs.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum("value").alias("sum_value"),
    )
    return purchases.join(stats, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.round(F.coalesce("sum_value", F.lit(0.0)), 6).alias("sum_click_value"),
    )
