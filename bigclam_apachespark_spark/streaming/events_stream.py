"""Structured Streaming surface over the ``events`` table (north-star
extension; the reference has no streaming of any kind — SURVEY.md §2
"not present"): watermarked event-time windows + custom stateful
sessionization via ``applyInPandasWithState``.

Design: the aggregation logic is the SAME column expressions as the
batch versions in ``operators/events.py`` — batch tests + DuckDB
oracle validate the semantics; streaming tests validate watermark /
state plumbing by replaying the parquet table as a file stream and
comparing the final sink contents to the batch answer.

Scale notes: windowed aggs keep one state row per (window, key) in
the state store (RocksDB provider in production); the watermark
bounds state size. Sessionization state is one open session per
user; ``applyInPandasWithState`` processes Arrow batches per key
group with timeout-driven eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Spark-native parquet (TIMESTAMP micros) — the common case.
EVENT_SCHEMA = _event_schema(T.TimestampType())


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory — replays
    the batch table as a stream (the standard replay-test harness;
    in production this is a Kafka source with the same schema).

    Handles BOTH ts physical types: Spark-written parquet stores
    TIMESTAMP(MICROS); the driver's fixtures store TIMESTAMP(NANOS),
    which Spark only surfaces as a long (nanosAsLong) — a cheap batch
    probe of the footer decides, and the nanos path converts with
    integer ``div`` (float division loses precision at epoch-nanos
    magnitudes).

    The file source requires a *directory*; when handed a single
    parquet file (the driver's fixtures are one file per table) we
    stage a symlink directory next to it in /tmp."""
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="events_stream_src_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    ts_dtype = dict(spark.read.parquet(path).dtypes).get("ts")
    if ts_dtype == "bigint":  # TIMESTAMP(NANOS) surfaced via nanosAsLong
        ts_type: T.DataType = T.LongType()
    elif ts_dtype == "timestamp_ntz":  # micros, isAdjustedToUTC=false
        ts_type = T.TimestampNTZType()
    else:
        ts_type = T.TimestampType()
    stream = (
        spark.readStream.schema(_event_schema(ts_type))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_dtype == "timestamp_ntz":
        # Streaming watermarks require TIMESTAMP (LTZ); interpret the
        # NTZ wall times as UTC instants, timezone-independently
        # (epoch micros vs the NTZ epoch literal → timestamp_micros),
        # so the event-time windows land on the same boundaries the
        # batch/oracle compute on the naive values.
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(F.timestamp_diff("MICROSECOND", epoch, F.col("ts"))),
        )
    return stream


def windowed_counts_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts — same expressions as the
    batch ``tumbling_window_agg``; the watermark lets Spark finalize
    and evict windows older than max(event time) − watermark, which
    is what bounds state at 100-TB stream scale.

    Output contract: ``window_start`` is ALWAYS TIMESTAMP_NTZ (UTC
    wall time), regardless of the source ts flavor — the inverse of
    the read-side conversion (read_events_stream normalizes every
    flavor to LTZ-as-UTC-instant for the watermark, since watermarks
    require LTZ). Emitting NTZ keeps the sink timezone-independent
    and bit-comparable against naive-timestamp batch/oracle answers;
    consumers that need an LTZ column should cast explicitly."""
    # window_start emitted as TIMESTAMP_NTZ (UTC wall time) via the
    # timezone-free inverse of the read-side NTZ→LTZ conversion, so the
    # sink compares bit-for-bit against the naive-timestamp oracle on
    # any session timezone.
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    start_ntz = F.timestamp_add(
        "MICROSECOND", F.unix_micros(F.col("w.start")), epoch
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(start_ntz.alias("window_start"), "event_type", "n_events", "sum_value")
    )


def click_attribution_stream(
    events: DataFrame,
    window_minutes: int = 60,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INTERVAL JOIN: each purchase joined to the same
    user's clicks within [purchase_ts − window, purchase_ts] →
    ``(purchase_id, user_id, purchase_ts, click_ts, click_value)``.
    The canonical two-stream attribution shape; batch twin:
    ``operators.temporal.click_window_stats`` (same time bounds).

    State story (the reason watermarks are mandatory here at scale):
    a stream-stream join buffers BOTH sides in the state store; the
    watermark + the time-range join condition let Spark evict any
    click older than max(event time) − watermark − window, bounding
    state to the attribution horizon regardless of stream length.
    ``how="inner"`` (default): results emit as matches arrive (no
    watermark wait), so a bounded Trigger.AvailableNow replay emits
    exactly the batch answer. ``how="left_outer"`` is the production
    attribution shape — purchases with NO qualifying click surface
    once with null click columns, but only AFTER the global watermark
    passes the purchase (until then a matching click could still
    arrive, so the row sits in state). Bounded-replay consequence,
    stated exactly (and encoded by the oracle twin): with final
    watermark W = min(max purchase ts, max click ts) − ``watermark``
    (the global watermark is the min over both sides' trackers),
    an unmatched purchase emits its null row iff ``p_ts < W``; tail
    purchases with ``p_ts >= W`` are still buffered when the replay
    stops and are absent from the sink. Matched rows emit eagerly in
    both modes.

    Both inputs derive from ONE source stream (Spark supports stream
    self-joins); timestamps are emitted as TIMESTAMP_NTZ UTC wall
    time, same sink contract as ``windowed_counts_stream``."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    j = p.join(c, cond, how)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def to_ntz(col):
        return F.timestamp_add("MICROSECOND", F.unix_micros(col), epoch)

    return j.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        to_ntz(F.col("p_ts")).alias("purchase_ts"),
        to_ntz(F.col("c_ts")).alias("click_ts"),
        "click_value",
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType(), True),  # epoch micros
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
        T.StructField("n_closed", T.LongType(), True),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def _session_fn(gap_seconds: int, timeout: str = "processing"):
    """Custom stateful operator: gap-based sessions per user. Emits a
    session row when the gap closes it; keeps the open session in
    state. ``timeout`` selects the idle-flush mechanism:

    - ``"processing"``: wall-clock timers (reference behavior for
      always-on jobs; nondeterministic relative to the data).
    - ``"event"``: watermark-driven — the session flushes when the
      EVENT-TIME watermark passes session_end + gap, which makes the
      emitted output a pure function of the data + batch boundaries
      (the production semantics; replay-deterministic).
    - ``"none"``: no timers (bounded replays; open sessions stay in
      state)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s0, last, n, sv, _ = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(s0, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_events": [n],
                        "sum_value": [sv],
                    }
                )
            return

        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        if state.exists:
            s0, last, n, sv, closed = state.get
        else:
            s0 = last = None
            n, sv, closed = 0, 0.0, 0

        # Vectorized segmentation: cumsum-of-breaks instead of a
        # Python per-row loop — only the open session crosses batch
        # boundaries through state. FLOOR-SECONDS gap, matching the
        # batch operator (operators/events.py epoch_seconds) and the
        # oracle's floor(epoch(ts)) difference — an exact-microsecond
        # compare splits sessions the batch twin merges whenever a
        # gap in (gap, gap+1) s straddles second boundaries.
        import numpy as np

        if len(rows) == 0:
            # a group can surface with no rows (e.g. timer-only
            # invocations); keep whatever state exists untouched
            if state.exists:
                state.update((s0, last, n, sv, closed))
                if timeout == "processing":
                    state.setTimeoutDuration(gap_seconds * 1000)
                elif timeout == "event":
                    state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
            return

        # normalize to ns first: pandas 2.x can surface datetime64[us]
        # from Arrow, and viewing THAT as int64 // 1000 would be
        # silently 1000x off
        ts_us = rows["ts"].to_numpy(dtype="datetime64[ns]").view("int64") // 1000
        sec = ts_us // 1_000_000
        vals = rows["value"].to_numpy(dtype="float64")
        brk = np.empty(len(ts_us), dtype=bool)
        brk[0] = True  # row 0 always opens the batch's first segment
        brk[1:] = (sec[1:] - sec[:-1]) > gap_seconds
        bounds = np.flatnonzero(brk)  # start index of each segment
        seg_start = ts_us[bounds]
        seg_end = ts_us[np.r_[bounds[1:] - 1, len(ts_us) - 1]]
        seg_n = (np.r_[bounds[1:], len(ts_us)] - bounds).astype("int64")
        seg_sv = np.add.reduceat(vals, bounds)

        out = []
        if state.exists:
            if sec[0] - last // 1_000_000 > gap_seconds:
                # carried session closed by the batch's first event
                out.append((user_id, s0, last, n, sv))
            else:
                # batch's first segment continues the carried session
                seg_start[0] = s0
                seg_n[0] += n
                seg_sv[0] += sv
        # all segments but the last close within this batch
        out.extend(
            (user_id, int(seg_start[i]), int(seg_end[i]), int(seg_n[i]), float(seg_sv[i]))
            for i in range(len(bounds) - 1)
        )
        s0 = int(seg_start[-1])
        last = int(seg_end[-1])
        n = int(seg_n[-1])
        sv = float(seg_sv[-1])
        state.update((s0, last, n, sv, closed + len(out)))
        if timeout == "processing":
            state.setTimeoutDuration(gap_seconds * 1000)
        elif timeout == "event":
            # Flush when the watermark passes the open session's close
            # horizon (last event + gap), in epoch millis.
            state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [o[4] for o in out],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    timeout: str = "processing",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming sessionization (the op Spark's
    built-in aggs lack) via ``applyInPandasWithState`` — per-user
    state with timeout-driven eviction. Batch twin:
    ``operators.events.sessionize`` (same gap semantics).

    ``timeout`` (see ``_session_fn``):
    - ``"event"`` — the 100-TB production semantics: sessions flush
      when the EVENT-TIME watermark (``watermark`` delay applied here)
      passes session_end + gap. Output is a deterministic function of
      the data + batch boundaries: a replay emits exactly the sessions
      the batch operator computes for every user whose horizon the
      watermark passed — replay-testable, unlike wall-clock timers.
    - ``"processing"`` (default, reference behavior): wall-clock idle
      flush for always-on jobs.
    - ``"none"``: no timers. Bounded replays (the driver's correctness
      gate) use this so a Trigger.AvailableNow run terminates as soon
      as the data is consumed — pending timers otherwise keep the
      query scheduling micro-batches until a watchdog kills it.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    conf = {
        "processing": GroupStateTimeout.ProcessingTimeTimeout,
        "event": GroupStateTimeout.EventTimeTimeout,
        "none": GroupStateTimeout.NoTimeout,
    }[timeout]
    if timeout == "event":
        events = events.withWatermark("ts", watermark)
    out = events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60, timeout),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
    # Sink contract, same as the sibling stream ops: timestamps are
    # TIMESTAMP_NTZ UTC wall time (a stateless projection after the
    # stateful op), and sum_value carries the batch twin's 6dp round.
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def to_ntz(c):
        return F.timestamp_add("MICROSECOND", F.unix_micros(F.col(c)), epoch)

    return out.select(
        "user_id",
        to_ntz("session_start").alias("session_start"),
        to_ntz("session_end").alias("session_end"),
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


# Last executed micro-batch physical plan per replay, captured by
# run_stream_to_memory / cdc_upsert_stream just before the query
# stops — scripts/dump_plans.py reads this to give the streaming
# registry entries the same reviewable plan sections as the batch
# queries (VERDICT r7 ask #7). Keyed by the sink/query name.
LAST_STREAM_PLANS: dict[str, str] = {}


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: float = 180.0,
    available_now: bool = True,
    strict: bool = False,
) -> "DataFrame":
    """Run a streaming query over a replayed file source into an
    in-memory sink; returns the sink table. Test harness helper.

    ``available_now=True`` (default): Trigger.AvailableNow — the query
    processes everything available at start and then STOPS ITSELF, so
    the replay terminates deterministically in ~one batch of work.
    This matters for stateful queries (applyInPandasWithState with
    processing-time timeouts): under processAllAvailable their
    timeout-driven evictions keep scheduling batches forever, and the
    run only ends when a watchdog kills it — which burned the whole
    watchdog budget per streaming query inside the driver's
    correctness gate (the r2 gate-truncation suspect).

    ``timeout_sec`` is retained as a hard watchdog for either mode: a
    hung streaming call must never wedge the test suite or the
    driver's gate. On timeout, whatever reached the sink is returned
    — UNLESS ``strict=True``, which raises instead: an oracle-checked
    replay must never hash-compare a truncated sink (a slow-host
    window would then read as a semantics bug)."""
    import threading

    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    timed_out = threading.Event()
    done = threading.Event()

    def _watchdog():
        if not done.wait(timeout_sec):
            timed_out.set()
            try:
                q.stop()
            except Exception:
                pass

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        if available_now:
            q.awaitTermination(timeout_sec)
        else:
            q.processAllAvailable()
    except Exception:
        if not timed_out.is_set():
            raise
    finally:
        done.set()
        try:
            # last micro-batch physical plan (plan capture for
            # PLANS.md; explainInternal is the string behind
            # StreamingQuery.explain)
            LAST_STREAM_PLANS[query_name] = q._jsq.explainInternal(False)
        except Exception:
            pass
        try:
            q.stop()
        except Exception:
            pass
    if strict and timed_out.is_set():
        raise RuntimeError(
            f"streaming replay '{query_name}' hit the {timeout_sec}s "
            "watchdog; refusing to return a truncated sink in strict mode"
        )
    return stream_df.sparkSession.table(query_name)


def enriched_counts_stream(
    events: DataFrame,
    dims: DataFrame,
    dim_key: str = "c_custkey",
    dim_col: str = "c_mktsegment",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC dimension join + windowed counts per segment →
    ``(window_start, segment, n_events, sum_value)`` — the most
    common production streaming shape (enrich each event with a
    slowly-changing dimension, then aggregate by the enriched
    attribute).

    State story: unlike a stream-stream join, the static side joins
    each micro-batch as an ordinary BROADCAST hash join — no state
    store entries at all; only the windowed agg keeps state, bounded
    by the watermark. The static table is re-resolvable per batch
    (file sources pick up overwrites), which is the cheap
    slowly-changing-dimension story at scale. Same NTZ sink contract
    as ``windowed_counts_stream``."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    start_ntz = F.timestamp_add(
        "MICROSECOND", F.unix_micros(F.col("w.start")), epoch
    )
    d = dims.select(
        F.col(dim_key).alias("user_id"), F.col(dim_col).alias("segment")
    )
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(d), "user_id", "inner")
        .groupBy(F.window("ts", width).alias("w"), "segment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(start_ntz.alias("window_start"), "segment", "n_events", "sum_value")
    )


def dedup_within_watermark_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming at-least-once dedup with WATERMARK-BOUNDED state →
    one ``(user_id, event_type, sec)`` row per distinct key, via
    ``dropDuplicatesWithinWatermark``. The retry-burst identity key
    is (user, type, floor-second): at-least-once ingestion re-emits
    the same logical event within seconds, and this collapses those
    while EVICTING state older than the watermark horizon — the
    100-TB-safe variant of plain ``dropDuplicates``, whose one-row-
    per-key-forever state grows without bound (the batch/streaming
    exact-dedup twins keep the unbounded variant for content
    fingerprints, where "forever" is the semantics; for event retry
    dedup it is not). On a bounded AvailableNow replay all data lands
    in one batch, where nothing has been evicted yet — so the emitted
    set equals the batch DISTINCT, which is what the oracle checks;
    the state bound is the production property."""
    sec = F.expr("unix_micros(ts) div 1000000")
    keyed = events.withWatermark("ts", watermark).select(
        "ts", "user_id", "event_type", sec.alias("sec")
    )
    return keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "sec"]
    ).select("user_id", "event_type", "sec")

def hll_users_windowed_stream(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    b: int = 8,
) -> DataFrame:
    """Streaming SKETCH: per-window HyperLogLog registers for
    distinct users → ``(window_start, bucket, register)`` — ONE
    watermarked stateful aggregation whose state per open window is
    m = 2^b small integers (register maxima) instead of the distinct
    user set. Registers are max-mergeable, estimates are not, so the
    streaming side carries only the mergeable form and the estimate
    finalizes in batch (``sketches.finalize_windowed_hll``) — the
    same registers-then-finalize split a production pipeline uses to
    merge per-day sketches into arbitrary ranges.

    Same md5-derived deterministic HLL as the batch operator
    (``sketches.hll_registers``): bucket/rank are integer functions
    of the shared hash, so the streamed registers — and therefore the
    finalized estimates — hash-match the DuckDB twin exactly.
    ``window_start`` is emitted as TIMESTAMP_NTZ UTC wall time, same
    sink contract as ``windowed_counts_stream``."""
    from bigclam_apachespark_spark.functions.hashing import hash64

    m = 1 << b
    width_bits = 60 - b
    h = hash64(F.col("user_id").cast("string"))
    w = F.shiftright(h, b)
    blen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(width_bits + 1)).otherwise(
        F.lit(width_bits) + 1 - blen
    )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    start_ntz = F.timestamp_add(
        "MICROSECOND", F.unix_micros(F.col("w.start")), epoch
    )
    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            (h % m).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(F.window("ts", width).alias("w"), "bucket")
        .agg(F.max("rho").alias("register"))
        .select(start_ntz.alias("window_start"), "bucket", "register")
    )


def cms_users_windowed_stream(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Streaming count-min sketch: per-window CMS counter table over
    user activity → ``(window_start, r, bucket, c)`` — ONE
    watermarked stateful aggregation whose state per open window is
    d·w integers instead of a per-user count table (the heavy-hitter
    feed for unbounded-cardinality keys). Counters are SUM-mergeable
    — the merge-friendly half of the sketch; point estimates (min
    over the d probed counters) finalize downstream in batch, the
    same split as the streamed HLL registers.

    Same md5-derived deterministic hashing as the batch sketch
    (``sketches.cms_counters``: hash64 of ``"cms{r}:" + term``),
    so the streamed counters hash-match the batch DuckDB twin
    exactly. ``window_start`` is TIMESTAMP_NTZ UTC wall time, same
    sink contract as ``windowed_counts_stream``."""
    from bigclam_apachespark_spark.functions.hashing import hash64

    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (
                        hash64(
                            F.concat(
                                F.lit(f"cms{r}:"),
                                F.col("user_id").cast("string"),
                            )
                        )
                        % w
                    )
                    .cast("int")
                    .alias("bucket"),
                )
                for r in range(d)
            ]
        )
    )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    start_ntz = F.timestamp_add(
        "MICROSECOND", F.unix_micros(F.col("w.start")), epoch
    )
    return (
        events.withWatermark("ts", watermark)
        .select("ts", probes.alias("p"))
        .select("ts", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
        .groupBy(F.window("ts", width).alias("w"), "r", "bucket")
        .agg(F.count("*").alias("c"))
        .select(start_ntz.alias("window_start"), "r", "bucket", "c")
    )


def session_window_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` under
    Structured Streaming → ``(user_id, session_start, session_end,
    n_events, sum_value)`` — the state-store-managed twin of both
    the batch ``session_window_agg`` and the custom
    ``applyInPandasWithState`` ``sessionize_stream``: Spark itself
    merges overlapping session state across micro-batches and
    evicts via the watermark, no user state code at all.

    Append-mode emission rule (probed and PINNED — the oracle
    encodes it): a session emits when the watermark passes its end,
    boundary INCLUSIVE — ``session_end <= max(ts) − delay`` under a
    bounded replay. Sessions still open at end-of-stream stay in
    the state store and never reach the sink, the same
    bounded-replay contract as ``sessionize_stream``'s
    sessions-minus-open rule, restated per-session here.

    ``window_start``/``session_end`` emit as TIMESTAMP_NTZ UTC wall
    time, same sink contract as ``windowed_counts_stream``."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def ntz(c):
        return F.timestamp_add("MICROSECOND", F.unix_micros(c), epoch)

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    return agg.select(
        "user_id",
        ntz(F.col("w.start")).alias("session_start"),
        ntz(F.col("w.end")).alias("session_end"),
        "n_events",
        "sum_value",
    )


def session_funnel_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """In-session funnel conversion under Structured Streaming →
    ``(user_id, session_start, session_end, clicked, converted)``
    per emitted session: the batch ``session_funnel`` order test
    (converted ⟺ max purchase (floor-seconds, event_id) key >
    min click key) carried by the BUILT-IN ``session_window`` state
    store — MIN/MAX over the key struct merge associatively, so
    Spark's cross-micro-batch session merging computes exactly the
    batch aggregate, event arrival order notwithstanding.

    Same pinned append-mode emission rule as
    ``session_window_stream``: a session emits when the watermark
    passes its end, boundary INCLUSIVE; still-open sessions never
    reach the sink (bounded-replay oracle restates both)."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def ntz(c):
        return F.timestamp_add("MICROSECOND", F.unix_micros(c), epoch)

    sec = F.unix_timestamp("ts")
    key = F.struct(sec.alias("s"), F.col("event_id").alias("e"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", key)).alias("ck"),
            F.max(F.when(F.col("event_type") == "purchase", key)).alias("pk"),
        )
    )
    return agg.select(
        "user_id",
        ntz(F.col("w.start")).alias("session_start"),
        ntz(F.col("w.end")).alias("session_end"),
        F.col("ck").isNotNull().cast("long").alias("clicked"),
        (
            F.col("ck").isNotNull()
            & F.col("pk").isNotNull()
            & (F.col("pk") > F.col("ck"))
        ).cast("long").alias("converted"),
    )
