"""Event-time operators over the ``events`` table (north-star
extension): tumbling/sliding window aggregations, sessionization,
and JSON property extraction — the batch halves of the Structured
Streaming surface in ``streaming/`` (same column logic, so batch
tests + DuckDB oracle validate what the streaming job computes).

Scale notes: window aggs are one hash-agg keyed by (bucket, ...) —
map-side combine applies; sessionization is one window function pass
partitioned by user (shuffle on user_id, linear within partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame, width: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time windows: count / sum(value) / distinct
    users per (window_start, event_type). Uses ``F.window`` — the same
    expression works under readStream with a watermark."""
    w = F.window(ts_col, width)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Sliding windows (width, slide): event counts per window. Each
    event lands in width/slide windows — explode factor 2 here."""
    w = F.window(ts_col, width, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def topk_per_window(
    events: DataFrame,
    k: int = 3,
    width: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Trending top-k per tumbling window → ``(window_start,
    user_id, n_events, rank)``: the k most active users in each
    event-time window, ties broken by user_id — the "trending
    items" report shape.

    Scale shape: one hash agg on (window, user) with map-side
    combine, then a rank whose window PARTITIONS by the time bucket
    (thousands of independent partitions — never a global sort; the
    plan guard's partitioned-window rule). At 100 TB the per-window
    group count is bounded by the active-user cardinality, and k
    caps the output."""
    from pyspark.sql import Window

    w = F.window(ts_col, width)
    per_user = (
        events.groupBy(w.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )
    rk = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= k)
        .select(
            "window_start", "user_id", "n_events",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when
    the gap to the previous event exceeds ``gap_minutes``. Classic
    lag + cumulative-sum window pass → ``(user_id, session_id,
    session_start, session_end, n_events, sum_value)``.

    session_id is per-user, 1-based, deterministic (ordered by ts,
    event_id tiebreak)."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    w = Window.partitionBy("user_id").orderBy(ts_col, "event_id")
    # Floor-seconds gap (not micros): matches the oracle's
    # floor(epoch(ts)) difference and the LTZ cast(long) truncation,
    # and works for TIMESTAMP_NTZ where cast(long) is illegal.
    ts_type = events.schema[ts_col].dataType.typeName()
    sec = epoch_seconds(F.col(ts_col), ts_type)
    gap = sec - F.lag(sec).over(w)
    with_break = events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = with_break.withColumn("session_id", F.sum("is_new").over(w))
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def cohort_retention(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention → ``(cohort_week, week_offset,
    n_users)``: users are cohorted by their first active epoch-week
    (floor-seconds // 604800 — pure integer arithmetic, cross-engine
    exact); each later active week counts them at offset = week −
    cohort_week. The classic growth-analytics query.

    Scale shape: the event stream collapses to DISTINCT (user, week)
    first (one hash-agg with map-side combine — the big shuffle); the
    per-user cohort min is a WINDOW over that already-small table, not
    a groupBy+join-back (the join formulation makes Catalyst re-scan
    events for the cohort branch — two FileScans of the raw table,
    which doubles the dominant cost at 100 TB; plan-asserted single
    scan in tests/test_plans.py); the final agg groups
    ~|users|·|weeks| rows by (cohort, offset)."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    wk = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(604800)).cast("long")
    user_weeks = events.select("user_id", wk.alias("wk")).distinct()
    w = Window.partitionBy("user_id")
    return (
        user_weeks.withColumn("cwk", F.min("wk").over(w))
        .groupBy(
            F.col("cwk").alias("cohort_week"),
            (F.col("wk") - F.col("cwk")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def window_anomaly_scores(
    events: DataFrame, width: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Per-window traffic anomaly score → ``(window_start, event_type,
    n_events, z_score)``: each (window, type) bucket's event count
    standardized against that type's mean/stddev across all windows —
    the basic monitoring query over event streams (|z| ≫ 0 flags
    traffic spikes/outages).

    Float discipline: counts are exact integers; mean is Σ/n (sum of
    integers folded in engine order → rounded output), stddev uses
    the explicit Σx² formulation (sqrt((Σx² − (Σx)²/n)/(n−1))) with
    INTEGER Σx and Σx² — both engines compute the same exact integer
    sums, so mean/std/z go through identical IEEE ops; only the
    output round matters. Windows with a single sample or zero
    variance emit z = 0.

    Scale shape: one hash-agg to (window, type) counts (map-side
    combine over the raw stream — the only big shuffle), then a tiny
    per-type window over |windows| rows."""
    from pyspark.sql import Window

    w = F.window(ts_col, width)
    counts = (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    tw = Window.partitionBy("event_type")
    sx = F.sum("n_events").over(tw)
    sxx = F.sum(F.col("n_events") * F.col("n_events")).over(tw)
    cnt = F.count("*").over(tw)
    mean = sx.cast("double") / cnt.cast("double")
    var = (sxx.cast("double") - sx.cast("double") * sx.cast("double") / cnt.cast("double")) / (
        cnt - 1
    ).cast("double")
    z = F.when(
        (cnt >= 2) & (var > 0),
        (F.col("n_events").cast("double") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return counts.select(
        "window_start", "event_type", "n_events", F.round(z, 6).alias("z_score")
    )


def gapfill_locf(
    events: DataFrame, width_hours: int = 1, ts_col: str = "ts"
) -> DataFrame:
    """Gap-filled per-type hourly rollup with last-observation-carried-
    forward → ``(event_type, window_start, sum_value, is_gap)`` —
    the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape: every
    (type, hour) slot between the type's first and last active hour
    exists in the output; empty slots carry the previous hour's
    (rounded) value and ``is_gap`` = 1.

    Exactness: slot timestamps come from integer epoch-hour
    arithmetic (never float); the filled value copies the ALREADY
    6dp-ROUNDED aggregate, so the fill introduces no new float
    hazard.

    Scale shape: one hash-agg to the (type, hour) rollup (the only
    pass over raw events), then the grid explode and the locf window
    run over rollup-sized data (|types|·|hours| rows); the sequence
    fan-out is bounded by the time span, not the event count."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    step = width_hours * 3600
    ts_type = events.schema[ts_col].dataType.typeName()
    hr = (F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(step)) * step).cast(
        "long"
    )
    agg = (
        events.select("event_type", hr.alias("slot"), "value")
        .groupBy("event_type", "slot")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"))
    )
    spans = agg.groupBy("event_type").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(step))).alias("slot"),
    )
    joined = grid.join(agg, ["event_type", "slot"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        # NTZ construction via the NTZ epoch literal — timezone-free
        # on any session (cast(timestamp_seconds(..)) would detour
        # through the session zone)
        F.timestamp_add(
            "SECOND", F.col("slot"), F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("window_start"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value"),
        F.when(F.col("sum_value").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


def resample_ohlc(
    events: DataFrame, width_hours: int = 1, ts_col: str = "ts"
) -> DataFrame:
    """Open/high/low/close resampling of the value series per
    (event_type, hour) → ``(event_type, window_start, open, high,
    low, close, n_events)`` — the financial/metrics downsampling
    shape. open/close are the first/last value by (ts, event_id)
    (deterministic tiebreak); every output is a SELECTED input value,
    never arithmetic, so all columns are bit-exact cross-engine with
    no rounding at all.

    Scale shape: one window pass per (type, slot) partition for the
    first/last ranks riding the same shuffle as the aggregation."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    step = width_hours * 3600
    ts_type = events.schema[ts_col].dataType.typeName()
    slot = (F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(step)) * step).cast(
        "long"
    )
    base = events.select(
        "event_type", slot.alias("slot"), F.col(ts_col).alias("_t"), "event_id", "value"
    )
    wa = Window.partitionBy("event_type", "slot").orderBy("_t", "event_id")
    wd = Window.partitionBy("event_type", "slot").orderBy(
        F.col("_t").desc(), F.col("event_id").desc()
    )
    ranked = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return ranked.groupBy("event_type", "slot").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
    ).select(
        "event_type",
        F.timestamp_add(
            "SECOND", F.col("slot"), F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("window_start"),
        "open", "high", "low", "close", "n_events",
    )


def rollup_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hierarchical subtotal report via ROLLUP → ``(event_type, day,
    n_events, lvl)``: per-(type, day) counts, per-type subtotals
    (day NULL), and the grand total (both NULL); ``lvl`` is
    ``grouping_id()``'s bitmask (0 = detail, 1 = type subtotal with
    the day bit set, 3 = grand total with both bits set) —
    disambiguating genuine NULL keys from subtotal markers, the
    standard GROUPING() idiom. One pass: Spark expands rollup groups
    in a single aggregation (no self-union of three scans).

    SURVEY.md §2 lists grouping sets/rollup/cube as absent from the
    reference; this exercises the surface as a first-class
    oracle-checked query."""
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast("long")
    return (
        events.select("event_type", day.alias("day"))
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n_events"), F.grouping_id().alias("lvl"))
        .select("event_type", "day", "n_events", F.col("lvl").cast("int").alias("lvl"))
    )


def clicked_never_purchased(events: DataFrame) -> DataFrame:
    """Users who clicked but never purchased → ``(user_id)`` via set
    EXCEPT (another SURVEY-listed absent-from-reference surface):
    distinct click users minus distinct purchase users (``subtract``
    = EXCEPT DISTINCT). Compiles to a left-anti aggregate join — no
    full-table materialization."""
    clicks = events.where(F.col("event_type") == "click").select("user_id")
    purchases = events.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.subtract(purchases)


def clicked_and_purchased(events: DataFrame) -> DataFrame:
    """Users who both clicked AND purchased → ``(user_id)`` via set
    INTERSECT (completing the set-operation surface with
    ``clicked_never_purchased``'s EXCEPT). Compiles to a left-semi
    aggregate join."""
    clicks = events.where(F.col("event_type") == "click").select("user_id")
    purchases = events.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(purchases)


def extract_props(events: DataFrame, key: str = "k") -> DataFrame:
    """JSON property extraction from the ``props`` string column →
    ``(event_id, k_val)``. ``get_json_object`` is JVM-side; at scale
    prefer parsing once via ``from_json`` into a struct column when
    multiple keys are read."""
    return events.select(
        "event_id",
        F.get_json_object("props", f"$.{key}").cast("long").alias("k_val"),
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Sessionization via Spark's BUILT-IN ``session_window`` →
    ``(user_id, session_start, session_end, n_events, sum_value)``
    — the native operator twin of the gaps-and-islands
    ``sessionize`` (same expression works under readStream with a
    watermark, where the island windows do not). ``session_end`` is
    the window's half-open close: last event + gap.

    Boundary semantics: the merge test is INCLUSIVE — an event
    arriving EXACTLY gap after the previous one EXTENDS the session
    (unit-tested, and the oracle's strict `> gap` new-session flag
    states it) — i.e. session_window agrees with the islands
    ``sessionize`` at the boundary; only the reported ``session_end``
    differs (last event + gap here vs last event there). Pinning
    this down matters because it is the off-by-one every
    sessionization migration trips over.

    Scale shape: one hash-partition on user + in-partition sort
    (Spark plans session_window as a partial merge of per-user
    sorted runs) — no driver state, no window over the global
    relation."""
    w = F.session_window(ts_col, gap)
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def extract_props_variant(events: DataFrame, key: str = "k") -> DataFrame:
    """Spark 4 VariantType path extraction → ``(event_id, k_val)``:
    ``parse_json`` decodes the props string ONCE into the
    binary-encoded variant, then ``try_variant_get`` reads a typed
    path — the modern replacement for repeated ``get_json_object``
    string re-parses (parse once, then O(1) typed access per key;
    with multiple keys the difference is a full JSON re-parse per
    key vs none). Same output contract as ``extract_props`` so the
    oracle is shared — the VALUES must agree, only the access path
    differs."""
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.try_variant_get(v, f"$.{key}", "long").alias("k_val"),
    )


def ordered_funnel(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Strict-order conversion funnel per user → ``(user_id, view_ts,
    click_ts, purchase_ts, stage)``: the first view, the first click
    AT OR AFTER that view, the first purchase at or after that click;
    ``stage`` ∈ {0..3} = how deep the user converted. Unlike the
    count-pivot funnel (event_type_funnel), this enforces EVENT-TIME
    ORDER — a purchase before any click does not count as conversion.

    All comparisons are on exact timestamps (micros) — no floats
    anywhere, so the oracle hash is trivially stable.

    Scale shape: three filtered min-aggregations chained by user-level
    joins; every aggregate combines map-side and every join key is
    user_id, so AQE coalesces/broadcasts the shrinking stage tables."""
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ts_col).alias("view_ts"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col(ts_col) >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min(ts_col).alias("click_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col(ts_col) >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min(ts_col).alias("purchase_ts"))
    )
    users = events.select("user_id").distinct()
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("view_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "view_ts", "click_ts", "purchase_ts",
            stage.cast("int").alias("stage"),
        )
    )


def event_type_funnel(events: DataFrame) -> DataFrame:
    """Per-user event-type counts in wide form (pivot) — the
    engagement-funnel shape: one shuffle on user_id, pivot values
    fixed so the plan is static."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        # count(lit(1)): Spark 4 rejects count(*) inside a pivot agg
        # (INVALID_USAGE_OF_STAR_OR_REGEX).
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def type_pivot(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily event-type count matrix via ``groupBy().pivot()`` →
    ``(day, click, error, purchase, signup, view)`` — the PIVOT
    surface (absent from the reference, SURVEY §2), exercised
    first-class. ``day`` is integer epoch-days (timezone-free, same
    arithmetic as ``rollup_report``).

    The pivot value list is EXPLICIT: without it Spark runs an extra
    distinct-collect job to discover the columns, and the output
    schema becomes data-dependent — both wrong at scale. With the
    list, this is one hash-agg (map-side combine) producing a fixed
    5-column schema; absent combinations are 0, not NULL."""
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast("long")
    p = (
        events.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES]
    )


def type_transitions(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """First-order event-type transition counts (the clickstream
    Markov matrix) → ``(prev_type, event_type, n)``: for each user's
    event sequence in event-time order, count consecutive type pairs.
    Exercises lag/ordered windows (absent from the reference) as a
    first-class query.

    Determinism: ordering is (ts, event_id) — the id tiebreak pins
    simultaneous events to one sequence on both engines. Scale shape:
    one per-user window pass (shuffle on user_id) + one hash-agg over
    at most |types|² groups."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_col, "event_id")
    return (
        events.select("user_id", "event_id", ts_col, "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


def cube_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """CUBE twin of ``rollup_counts`` → the same ``(event_type, day,
    n_events, lvl)`` schema plus the per-day-across-types slice that
    ROLLUP omits (lvl = 2: event_type NULL, day set) — completing the
    grouping-sets surface (SURVEY §2 lists it absent from the
    reference). Same single-aggregation expansion, same
    ``grouping_id()`` disambiguation of subtotal NULLs."""
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast("long")
    return (
        events.select("event_type", day.alias("day"))
        .cube("event_type", "day")
        .agg(F.count("*").alias("n_events"), F.grouping_id().alias("lvl"))
        .select("event_type", "day", "n_events", F.col("lvl").cast("int").alias("lvl"))
    )


def value_quantiles(
    events: DataFrame, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """EXACT per-type value quantiles → ``(event_type, p, q)``: the
    ceil(p·n)-th order statistic of ``value`` within each event type
    (inverse-CDF convention, same as text_length_quantiles). q is a
    SELECTED input value — no arithmetic, no rounding needed — and
    the rank threshold ceil(p·n) is one identical double product on
    both engines, so the selection cannot drift.

    Scale note: exact quantiles require the order statistic — one
    per-type sort (window). This is the cross-checkable ground-truth
    path; production monitoring at 100 TB uses approx_percentile
    (t-digest, no sort), which an oracle can never hash-match — run
    this on samples to calibrate the sketch's error instead."""
    from pyspark.sql import Window

    # NULL values are excluded on BOTH engines before ranking: Spark
    # sorts NULLs first in ASC while DuckDB defaults to NULLS LAST, so
    # a nullable value column would silently shift every rank.
    ev = events.select("event_type", "event_id", "value").where(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.withColumn("r", F.row_number().over(w))
    n = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    p_df = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    probes = n.select("event_type", "n", p_df)
    return (
        ranked.join(probes, "event_type")
        .where(F.col("r") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("event_type", "p")
        .agg(F.min("value").alias("q"))
    )


def dau_wau(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily/weekly active users + stickiness → ``(day, dau, wau,
    stickiness)``: dau = distinct users active on the day, wau =
    distinct users active in the trailing 7-day window ending that
    day, stickiness = round(dau/wau, 6) — the standard engagement
    report.

    Shape: the event stream collapses to DISTINCT (user, day) first
    (the only big shuffle); the trailing window is a BOUNDED 7× row
    fan-out of that small table (each active day contributes to 7
    target days) + one distinct-agg — no range join, no per-day
    rescan. Days are integer epoch-days (timezone-free); only target
    days with actual activity are reported."""
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    # ud is already DISTINCT (user_id, day) — a plain count avoids the
    # redundant distinct-aggregate expand/exchange; wau keeps
    # countDistinct because the 7x fan-out does create duplicates.
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day")
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def growth_accounting(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily growth accounting → ``(day, n_new, n_returning)``: each
    active user classified per day as NEW (their first active epoch
    day — floor-seconds // 86400, integer-exact cross-engine) or
    RETURNING — the DAU decomposition next to ``cohort_retention``
    in every product-analytics suite.

    Scale shape mirrors retention's single-scan discipline: collapse
    to DISTINCT (user, day) first (the big map-side-combined
    hash-agg), take the per-user first day as a window MIN over that
    small table (a groupBy+join-back would re-scan events), then one
    (day)-keyed count agg."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast("long")
    user_days = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id")
    flagged = user_days.withColumn("first_day", F.min("day").over(w))
    return (
        flagged.groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long")).alias("n_new"),
            F.sum((F.col("day") != F.col("first_day")).cast("long")).alias(
                "n_returning"
            ),
        )
    )


def cohort_ltv(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekly cohort lifetime value → ``(cohort_week, week_offset,
    cohort_size, wk_revenue, cum_ltv_per_user)``: users cohorted by
    first active epoch-week (same integer week rule as
    ``cohort_retention``); per cohort and offset, the purchase
    revenue landed that week and the CUMULATIVE revenue per cohort
    member so far — the payback-curve query every growth team pairs
    with retention.

    Money discipline: revenue folds as integer cents (round(v·100)
    per event — exact cross-engine); the running sum is an integer
    cumsum; the single per-row division chain (cents → dollars →
    per-user) runs in one fixed order on exact inputs.

    Scale shape: events collapse once to (user, cwk) — one hash agg
    over user_id; purchases join that narrow table and aggregate to
    |cohorts|·|offsets| rows BEFORE the running-sum window, whose
    partitions are offset-bounded (a window over the aggregate, not
    the event stream). Offsets with zero purchases don't emit (no
    spine join — both engines agree)."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    wk = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(604800)).cast(
        "long"
    )
    first = (
        events.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cwk"))
    )
    sizes = first.groupBy("cwk").agg(F.count("*").alias("cohort_size"))
    rev = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            wk.alias("wk"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .join(first, "user_id")
        .groupBy(
            F.col("cwk").alias("cohort_week"),
            (F.col("wk") - F.col("cwk")).alias("week_offset"),
        )
        .agg(F.sum("cents").alias("wk_cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.withColumn("cum_cents", F.sum("wk_cents").over(w))
        .join(sizes.withColumnRenamed("cwk", "cohort_week"), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            F.round(F.col("wk_cents").cast("double") / 100.0, 6).alias(
                "wk_revenue"
            ),
            F.round(
                F.col("cum_cents").cast("double")
                / 100.0
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("cum_ltv_per_user"),
        )
    )


def session_funnel(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts"
) -> DataFrame:
    """Within-session funnel conversion → per session-start day
    ``(day, n_sessions, n_with_click, n_converted, conv_rate)``:
    a session CONVERTS when any purchase happens strictly after its
    FIRST click — the order-sensitive in-session metric a flat
    click∧purchase count gets wrong (purchase-then-click sessions
    must not convert). Session ids are the same lag+cumsum pass as
    ``sessionize``.

    The order test is exact: events compare by the (floor-seconds,
    event_id) tuple, and "exists a purchase after the first click"
    is equivalent to max(purchase key) > min(click key) — ONE hash
    agg per session, no self-join back onto the event stream.
    conv_rate = n_converted / n_with_click, a single guarded
    division of exact integers (NULL when no session clicked)."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    sec = epoch_seconds(F.col(ts_col), ts_type)
    w = Window.partitionBy("user_id").orderBy(ts_col, "event_id")
    gap = sec - F.lag(sec).over(w)
    ev = events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_id", F.sum("is_new").over(w))
    key = F.struct(sec.alias("s"), F.col("event_id").alias("e"))
    per = ev.groupBy("user_id", "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.min(F.when(F.col("event_type") == "click", key)).alias("ck"),
        F.max(F.when(F.col("event_type") == "purchase", key)).alias("pk"),
    )
    per = per.select(
        F.col("session_start").cast("date").alias("day"),
        F.col("ck").isNotNull().cast("long").alias("clicked"),
        (
            F.col("ck").isNotNull()
            & F.col("pk").isNotNull()
            & (F.col("pk") > F.col("ck"))
        ).cast("long").alias("converted"),
    )
    agg = per.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum("clicked").alias("n_with_click"),
        F.sum("converted").alias("n_converted"),
    )
    return agg.select(
        "day",
        "n_sessions",
        "n_with_click",
        "n_converted",
        F.when(
            F.col("n_with_click") > 0,
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_with_click").cast("double"),
                6,
            ),
        ).alias("conv_rate"),
    )


def robust_outliers(events: DataFrame, k: int = 3) -> DataFrame:
    """Median/MAD robust outlier census → ``(event_type, med, mad,
    n_outliers)``: per type, the EXACT median (ceil(p·n) order
    statistic, same inverse-CDF convention as ``value_quantiles``),
    the exact median absolute deviation, and how many events sit
    more than ``k``·MAD from the median — the monitoring rule that
    survives the heavy-tailed value distributions where mean/stddev
    z-scores (``window_anomaly_scores``) are themselves dragged by
    the outliers they're meant to find.

    Exactness: both medians are SELECTED input values (no
    interpolation); |v − med| is one IEEE subtraction of identical
    doubles; the k·MAD threshold compare therefore agrees
    bit-for-bit cross-engine.

    Scale shape: two per-type ranked windows (the exact-order-
    statistic ground-truth path — same contract note as
    value_quantiles: at 100 TB production uses a sketch calibrated
    against this on samples)."""
    from pyspark.sql import Window

    ev = events.select("event_type", "event_id", "value").where(
        F.col("value").isNotNull()
    )
    n = ev.groupBy("event_type").agg(F.count("*").alias("_n"))

    def _median_of(df, col):
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        ranked = df.withColumn("_r", F.row_number().over(w)).join(n, "event_type")
        return (
            ranked.where(F.col("_r") >= F.ceil(0.5 * F.col("_n")))
            .groupBy("event_type")
            .agg(F.min(col).alias(f"_med_{col}"))
        )

    med = _median_of(ev, "value").withColumnRenamed("_med_value", "_med")
    dev = ev.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("_med"))
    )
    mad = _median_of(dev.select("event_type", "event_id", "dev"), "dev")
    mad = mad.withColumnRenamed("_med_dev", "_mad")
    flagged = dev.join(mad, "event_type").groupBy("event_type").agg(
        F.sum(
            (F.col("dev") > F.lit(float(k)) * F.col("_mad")).cast("long")
        ).alias("n_outliers")
    )
    return (
        med.join(mad, "event_type")
        .join(flagged, "event_type")
        .select(
            "event_type",
            F.round("_med", 6).alias("med"),
            F.round("_mad", 6).alias("mad"),
            "n_outliers",
        )
    )


def time_to_convert(
    events: DataFrame,
    ps: tuple = (0.5, 0.9, 0.99),
    ts_col: str = "ts",
) -> DataFrame:
    """Click→purchase latency distribution → ``(p, latency_sec,
    n_converted)``: per user, the seconds from the FIRST click to
    the FIRST purchase AFTER it (same (floor-seconds, event_id)
    tuple order as ``session_funnel`` — a purchase preceding every
    click never converts), then the EXACT ceil(p·n) order
    statistics of those latencies — the attribution-latency curve
    that sets streaming watermark widths (the p99 here IS the
    justified lateness bound for the join state).

    All-integer end to end: latencies are second differences,
    quantiles are SELECTED values (shared inverse-CDF convention
    with ``value_quantiles``), no floats anywhere but the p labels.

    Scale shape: two user-keyed hash aggs (first click, first
    qualifying purchase); the global order statistic uses the
    bucketed two-stage rank kernel — converters are corpus-scale,
    so a plain unpartitioned window here is exactly what the
    registry-wide plan guard exists to forbid."""
    from bigclam_apachespark_spark.functions.ranks import bucketed_row_number
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    sec = epoch_seconds(F.col(ts_col), ts_type)
    keyed = events.select(
        "user_id",
        "event_type",
        F.struct(sec.alias("s"), F.col("event_id").alias("e")).alias("k"),
    )
    first_click = (
        keyed.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("k").alias("ck"))
    )
    conv = (
        keyed.where(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .where(F.col("k") > F.col("ck"))
        .groupBy("user_id")
        .agg(F.min("k").alias("pk"), F.first("ck").alias("ck2"))
        .select(
            "user_id",
            (F.col("pk.s") - F.col("ck2.s")).cast("long").alias("lat"),
        )
    )
    n = conv.agg(F.count("*").alias("n"))
    ranked = bucketed_row_number(conv, ["lat", "user_id"], out="r")
    probes = n.select(
        "n",
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
    )
    return (
        ranked.crossJoin(F.broadcast(probes))
        .where(F.col("r") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(
            F.min("lat").alias("latency_sec"),
            F.first("n").alias("n_converted"),
        )
        .orderBy("p")
    )


def equidepth_bins(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Equi-depth (equal-frequency) feature binning → ``(event_type,
    bin, n_rows, lo_cents, hi_cents)``: per type, the bin boundaries
    are the exact inverse-CDF order statistics at k/n_bins and every
    row lands in ``bin = #{boundaries strictly below its cent
    value}`` — the deterministic tie rule (rows sharing a value share
    a bin; exact n/k splits under heavy ties would need an arbitrary
    within-tie order, which is precisely what NTILE does and why
    NTILE output can never be hash-matched cross-engine). The
    standard feature-engineering discretization, with counts + the
    observed [lo, hi] per bin as the bin card.

    Scale shape: boundary extraction shares value_quantiles' exact
    order-statistic path (per-type window — the ground-truth
    calibration path; production uses the histogram sketch); the
    boundary table is n_bins·|types| rows and BROADCASTS onto a
    single narrow pass over the events, so assignment adds no
    shuffle beyond the final per-(type, bin) hash agg."""
    from pyspark.sql import Window

    ev = events.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    ).where(F.col("vc").isNotNull())
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = ev.withColumn("r", F.row_number().over(w))
    n = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(1, n_bins)])
    ).alias("k")
    probes = n.select("event_type", "n", ks)
    bounds = (
        ranked.join(probes, "event_type")
        .where(
            F.col("r")
            >= F.ceil(F.col("k").cast("double") * F.col("n") / n_bins)
        )
        .groupBy("event_type", "k")
        .agg(F.min("vc").alias("b"))
    )
    assigned = (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            "event_id",
            "vc",
            F.when(F.col("b") < F.col("vc"), 1).otherwise(0).alias("below"),
        )
        .groupBy("event_type", "event_id", "vc")
        .agg(F.sum("below").cast("int").alias("bin"))
    )
    return assigned.groupBy("event_type", "bin").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("vc").alias("lo_cents"),
        F.max("vc").alias("hi_cents"),
    )


def changepoint_scan(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Changepoint detection on the daily count series →
    ``(event_type, cp_day, n_days, n_total, dev_num)``: per type, the
    day maximizing the CUSUM/KS deviation |n·S_i − i·S_n| where S_i
    is the running count through day i over n days — the standard
    single-changepoint location statistic (the maximizer of the
    scaled |empirical CDF − uniform ramp|). EVERYTHING is exact
    int64: the deviation is the cross-multiplied form (never the
    float S_i/S_n − i/n), so the argmax is engine-exact; ties break
    on the earlier day.

    Scale shape: the event stream collapses to per-(type, day)
    counts first (the only big shuffle); the cumulative sum +
    argmax run over the day-count relation (|types|·|days| rows —
    tiny), where a bounded window is the right tool."""
    from pyspark.sql import Window

    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast(
        "long"
    )
    daily = (
        events.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "day",
        F.sum("c").over(w).alias("s_i"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    )
    tot = cum.groupBy("event_type").agg(
        F.max("i").cast("long").alias("n_days"),
        F.max("s_i").cast("long").alias("n_total"),
    )
    dev = cum.join(tot, "event_type").select(
        "event_type",
        "day",
        "n_days",
        "n_total",
        F.abs(
            F.col("n_days") * F.col("s_i") - F.col("i") * F.col("n_total")
        ).alias("dev"),
    )
    return dev.groupBy("event_type").agg(
        F.min_by(
            F.struct(F.col("day"), F.col("dev")),
            F.struct((-F.col("dev")).alias("d"), F.col("day")),
        ).alias("_m"),
        F.min("n_days").alias("n_days"),
        F.min("n_total").alias("n_total"),
    ).select(
        "event_type",
        F.col("_m.day").alias("cp_day"),
        "n_days",
        "n_total",
        F.col("_m.dev").cast("long").alias("dev_num"),
    )


def seasonal_naive_backtest(
    events: DataFrame, ts_col: str = "ts", lag_days: int = 7
) -> DataFrame:
    """Forecast-baseline backtest → ``(event_type, n_scored_days,
    mae_milli, bias_milli)``: the seasonal-naive forecast (predict
    day d's count = day d−lag's count — THE baseline every real
    forecasting system must beat before it ships) scored against
    actuals over every day with a lag partner. MAE and bias are
    exact integer sums divided once and reported in milli-units, so
    the row is engine-exact — the honest-measurement pattern applied
    to forecasting.

    Scale shape: the stream collapses to per-(type, day) counts (the
    only big shuffle); the lag join + error agg run on the tiny day
    relation. Days absent from the counts are genuinely absent
    (count-0 days contribute no row — the backtest scores the
    OBSERVED day pairs, stated here because gap semantics change MAE)."""
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast(
        "long"
    )
    daily = (
        events.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    lagged = daily.select(
        "event_type",
        (F.col("day") + lag_days).alias("day"),
        F.col("c").alias("pred"),
    )
    scored = daily.join(lagged, ["event_type", "day"])
    return scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_scored_days"),
        F.round(
            F.sum(F.abs(F.col("c") - F.col("pred"))).cast("double")
            * 1000.0
            / F.count("*").cast("double"),
            6,
        ).alias("mae_milli"),
        F.round(
            F.sum(F.col("c") - F.col("pred")).cast("double")
            * 1000.0
            / F.count("*").cast("double"),
            6,
        ).alias("bias_milli"),
    )


def ab_cuped_readout(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """A/B experiment readout with CUPED variance reduction →
    ``(arm, n_users, mean_y_milli, mean_adj_milli)``: users split
    into arms by the deterministic md5 coin (hash % 2), the
    observation window splits at its integer midpoint day into
    pre-period covariate x (per-user value cents) and post-period
    metric y, and the CUPED adjustment (Deng et al. WSDM'13)
    reports ȳ_arm − θ·(x̄_arm − x̄_pool) with the pooled
    θ = cov(x,y)/var(x) — the industry-standard way to cut
    experiment variance with pre-experiment data.

    Float discipline: x, y are exact integer cents; the pooled
    moments (n, Σx, Σy, Σxy, Σx²) are decimal(38,0) folds
    (associative — engine-exact); θ and the arm means are a FIXED
    chain of IEEE ops over those exact sums, so the rounded output
    hashes cross-engine. A zero pre-period variance degenerates
    θ to 0 (adjusted = raw — stated, not a divide error).

    Scale shape: the event stream collapses to per-(user, period)
    cent sums (the one big shuffle, map-side combined); moments and
    arm aggregates run over the user-sized relation; θ is a 1-row
    broadcast."""
    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast(
        "long"
    )
    ev = events.where(F.col("value").isNotNull()).select(
        "user_id",
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    span = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    per_user = (
        ev.join(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("mid"), F.col("vc")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("day") > F.col("mid"), F.col("vc")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .withColumn(
            "arm",
            F.when(
                hash64(F.col("user_id").cast("string")) % 2 == 0, "control"
            ).otherwise("treatment"),
        )
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sxx"),
    ).select(
        "n",
        "sx",
        F.when(
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
            > 0.0,
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(d("x")).alias("ax"),
        F.sum(d("y")).alias("ay"),
    )
    return arms.join(F.broadcast(mom)).select(
        "arm",
        "n_users",
        F.round(
            F.col("ay").cast("double")
            / F.col("n_users").cast("double")
            * 10.0,
            6,
        ).alias("mean_y_milli"),
        F.round(
            (
                F.col("ay").cast("double") / F.col("n_users").cast("double")
                - F.col("theta")
                * (
                    F.col("ax").cast("double") / F.col("n_users").cast("double")
                    - F.col("sx").cast("double") / F.col("n").cast("double")
                )
            )
            * 10.0,
            6,
        ).alias("mean_adj_milli"),
    )


def ab_power_readout(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Experiment design readout → ONE row ``(n_users, var_y_milli,
    rho2_milli, vr_factor_milli, mde_milli, mde_cuped_milli)``: from
    the SAME per-user pre/post moments as ``ab_cuped_readout``,
    the population metric variance, the squared pre/post correlation
    ρ² (CUPED removes exactly that fraction of variance), and the
    two-sample minimum detectable effect at the standard α = .05 /
    power = .8 operating point (MDE = 2.8·σ·√(2/n_arm), Deng et
    al.'s rule of thumb) — raw and CUPED-adjusted. This is how the
    CURRENT experiment's data sizes the NEXT one.

    Determinism: all moments are decimal(38,0) integer folds; the
    variance/ρ²/MDE chain is a fixed sequence of IEEE ops over those
    exact sums (2.8 and the milli scales are exact literals), so the
    row hashes cross-engine. Degenerate variances (constant metric
    or covariate) report ρ² = 0 and the raw MDE.

    Scale shape: identical to the CUPED readout — one per-user
    cent-sum shuffle, then 1-row arithmetic."""
    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.functions.timeutil import epoch_seconds

    ts_type = events.schema[ts_col].dataType.typeName()
    day = F.floor(epoch_seconds(F.col(ts_col), ts_type) / F.lit(86400)).cast(
        "long"
    )
    ev = events.where(F.col("value").isNotNull()).select(
        "user_id",
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    span = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    per_user = (
        ev.join(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("mid"), F.col("vc")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("day") > F.col("mid"), F.col("vc")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sxx"),
        F.sum(d("y") * d("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    # explicit multiplies, not ** (pow(x, 2) is not guaranteed ulp-equal
    # to x*x, and the oracle multiplies)
    var_y = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / nd
    ) / (nd - 1.0)
    var_x = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
    ) / (nd - 1.0)
    cov = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / nd
    ) / (nd - 1.0)
    rho2 = F.when(
        (var_x > 0.0) & (var_y > 0.0), cov * cov / (var_x * var_y)
    ).otherwise(F.lit(0.0))
    mde = F.lit(2.8) * F.sqrt(var_y) * F.sqrt(2.0 / (nd / 2.0))
    mde_c = F.lit(2.8) * F.sqrt(var_y * (1.0 - rho2)) * F.sqrt(2.0 / (nd / 2.0))
    return mom.select(
        "n",
        F.round(var_y / 100.0, 6).alias("var_y_milli"),
        F.round(rho2 * 1000.0, 6).alias("rho2_milli"),
        F.round((1.0 - rho2) * 1000.0, 6).alias("vr_factor_milli"),
        F.round(mde * 10.0, 6).alias("mde_milli"),
        F.round(mde_c * 10.0, 6).alias("mde_cuped_milli"),
    ).withColumnRenamed("n", "n_users")
