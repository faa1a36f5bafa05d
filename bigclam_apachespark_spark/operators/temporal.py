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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the payload of one right row
    for the same ``on`` key (NULLs when none — left-outer semantics).
    ``direction`` picks which (merge_asof parity):

    - ``"backward"`` (default): latest right with ``right_ts <=
      left_ts``.
    - ``"forward"``: earliest right with ``right_ts >= left_ts``.
    - ``"nearest"``: whichever of those two is closer in time;
      exact-distance ties (including an equal-timestamp right row,
      distance 0 both ways) resolve BACKWARD, matching pandas.

    All three are the same one-shuffle union-sort plan — direction
    only changes the running window's frame (backward scans the
    preceding frame with ``last``, forward the following frame with
    ``first``; nearest computes both in ONE sort and picks per row).

    Ties at the matched timestamp resolve to the greatest
    ``right_tie`` value under backward and the smallest under forward
    — or, when no tie column is given, the greatest/smallest payload
    struct (field-order comparison) — deterministic and cross-engine
    stable either way. A right row timestamped exactly at ``left_ts``
    DOES match in every direction.

    ``tolerance_sec`` nulls out matches farther than the horizon —
    the bounded-staleness variant (merge_asof's ``tolerance``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    payload = payload or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    rp = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
    )
    # Side ordering at EQUAL timestamps: backward/nearest scan the
    # preceding frame, so right must sort before left (side 0 < 1)
    # for an equal-ts right row to be inside the frame; forward scans
    # the following frame, so right must sort after left (side 2).
    side_r = 2 if direction == "forward" else 0
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(side_r).alias("_side"),
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

    base = Window.partitionBy(*on).orderBy("_t", "_side", "_tie")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u = l.unionByName(r.select(*l.columns))
    # Dispatch epoch extraction on EACH side's own dtype: _t came
    # from the left column, _rts from the right one, and the two may
    # carry different timestamp flavors (NTZ vs LTZ).
    l_type = left.schema[left_ts].dataType.typeName()
    r_type = right.schema[right_ts].dataType.typeName()

    horizon = None if tolerance_sec is None else int(tolerance_sec * 1_000_000)
    lt = _micros(F.col("_t"), l_type)

    if direction in ("backward", "forward"):
        m = (
            F.last("_rp", ignorenulls=True).over(wb)
            if direction == "backward"
            else F.first("_rp", ignorenulls=True).over(wf)
        )
        matched = u.withColumn("_m", m).where(F.col("_side") == 1)
        if horizon is not None:
            mt = _micros(F.col("_m._rts"), r_type)
            dist = (lt - mt) if direction == "backward" else (mt - lt)
            matched = matched.withColumn(
                "_m", F.when(dist <= horizon, F.col("_m"))  # else NULL
            )
    else:  # nearest: both scans share the ONE sorted partition pass.
        # The forward frame excludes equal-ts right rows (they sort
        # before left) — harmless: those are distance 0, and ties
        # resolve backward, where they ARE in frame.
        db = lt - _micros(F.col("_mb._rts"), r_type)
        df = _micros(F.col("_mf._rts"), r_type) - lt
        matched = (
            u.withColumn("_mb", F.last("_rp", ignorenulls=True).over(wb))
            .withColumn("_mf", F.first("_rp", ignorenulls=True).over(wf))
            .where(F.col("_side") == 1)
        )
        if horizon is not None:
            # tolerance applies PER SIDE before choosing (merge_asof
            # parity: the nearest match WITHIN tolerance wins even
            # when the globally nearest one is out of range)
            matched = matched.withColumn(
                "_mb", F.when(db <= horizon, F.col("_mb"))
            ).withColumn("_mf", F.when(df <= horizon, F.col("_mf")))
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_mb").isNotNull()
                & (F.col("_mf").isNull() | (db <= df)),
                F.col("_mb"),
            ).otherwise(F.col("_mf")),
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


def click_to_next_purchase(events: DataFrame) -> DataFrame:
    """Time-to-conversion via FORWARD as-of: each ``click`` joined to
    the same user's NEXT ``purchase`` at-or-after the click →
    ``(click_id, user_id, click_ts, purchase_ts, purchase_id,
    lag_us)``. Clicks never followed by a purchase keep NULLs; equal
    timestamps match (inclusive >=), ties resolve to the smallest
    purchase id (the forward tie rule). Same one-shuffle union-sort
    plan as the backward join."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    j = as_of_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="ts",
        payload=["purchase_id"],
        right_tie="purchase_id",
        prefix="p_",
        direction="forward",
    )
    ts_type = events.schema["ts"].dataType.typeName()
    return j.select(
        "click_id",
        "user_id",
        "click_ts",
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_purchase_id").alias("purchase_id"),
        (
            _micros(F.col("p_ts"), ts_type)
            - _micros(F.col("click_ts"), ts_type)
        ).alias("lag_us"),
    )


def nearest_click_attribution(events: DataFrame) -> DataFrame:
    """NEAREST-direction attribution: each ``purchase`` joined to the
    same user's closest ``click`` in either time direction →
    ``(purchase_id, user_id, purchase_ts, click_ts, click_id,
    gap_us)`` with ``gap_us`` SIGNED (negative = click before
    purchase). Exact-distance ties resolve backward; at the matched
    timestamp, ties resolve to the greatest click id when the
    backward side wins and the smallest when the forward side does
    (the per-direction tie rules). One union-sort pass — both scans
    share the sort."""
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
        direction="nearest",
    )
    ts_type = events.schema["ts"].dataType.typeName()
    return j.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("c_ts").alias("click_ts"),
        F.col("c_click_id").alias("click_id"),
        (
            _micros(F.col("c_ts"), ts_type)
            - _micros(F.col("purchase_ts"), ts_type)
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
