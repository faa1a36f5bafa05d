"""Similarity-search, event-window, and multimodal plumbing tests."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from bigclam_apachespark_spark.operators.events import (
    event_type_funnel,
    extract_props,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)
from bigclam_apachespark_spark.operators.multimodal import (
    frame_sample_plan,
    media_features,
    synthetic_media,
)
from bigclam_apachespark_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    hyperplane_buckets,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.98, 0.02, 0.0]),   # near-dup of 2
    (4, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>").cache()


def test_ivf(vecs):
    cent = ivf_centroids(vecs, n_cells=2, vec_col="embedding")
    assert cent.count() == 2
    assert {r["cell"] for r in cent.collect()} == {0, 1}
    assign = ivf_assign(vecs, cent, vec_col="embedding")
    # Every vector gets exactly one cell, all cells in range.
    rows = assign.collect()
    assert len(rows) == len(VECS)
    assert all(0 <= r["cell"] < 2 for r in rows)
    # With nprobe = n_cells IVF degenerates to brute force — identical
    # ranking (the recall guarantee at full probe width).
    q = vecs.where(F.col("vec_id") == 0)
    full = ivf_topk(vecs, q, k=2, n_cells=2, nprobe=2, vec_col="embedding")
    brute = brute_force_topk(vecs, q, k=2, vec_col="embedding")
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))
    # Probing 1 of 2 cells returns a subset of the corpus ranking.
    part = ivf_topk(vecs, q, k=2, n_cells=2, nprobe=1, vec_col="embedding")
    assert part.count() <= 2


def test_brute_force_topk(vecs):
    q = vecs.where(F.col("vec_id") == 0)
    top = brute_force_topk(vecs, q, k=2, vec_col="embedding")
    rows = sorted((r["rank"], r["vec_id"]) for r in top.collect())
    assert rows[0] == (1, 1)  # nearest neighbor of 0 is 1
    cs = {r["vec_id"]: r["cos_sim"] for r in top.collect()}
    assert cs[1] == pytest.approx(0.99 / math.sqrt(0.99**2 + 0.01**2), abs=1e-5)


def test_hyperplane_lsh(vecs):
    b = {r["vec_id"]: r["bucket"] for r in
         hyperplane_buckets(vecs, n_planes=4, dim=4).collect()}
    assert b[0] == b[1]  # near-identical vectors share the bucket
    assert b[2] == b[3]
    q = vecs.where(F.col("vec_id") == 0)
    top = lsh_topk(vecs, q, k=1, n_planes=4, dim=4)
    got = [(r["vec_id"], r["rank"]) for r in top.collect()]
    assert got == [(1, 1)]
    dups = {(r["a"], r["b"]) for r in
            cosine_near_dup_pairs(vecs, threshold=0.99, n_planes=4, dim=4).collect()}
    assert (0, 1) in dups
    assert (2, 3) in dups


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
EVENTS = [
    # user 1: two sessions (gap > 30 min between e2 and e3)
    (0, T0, 1, "view", 1.0, '{"k": 5}'),
    (1, T0 + dt.timedelta(minutes=10), 1, "click", 2.0, '{"k": 6}'),
    (2, T0 + dt.timedelta(minutes=20), 1, "purchase", 3.0, '{"k": 7}'),
    (3, T0 + dt.timedelta(minutes=90), 1, "view", 4.0, '{"k": 8}'),
    # user 2: one session spanning an hour boundary
    (4, T0 + dt.timedelta(minutes=55), 2, "view", 5.0, '{"k": 9}'),
    (5, T0 + dt.timedelta(minutes=65), 2, "error", 6.0, '{"k": 10}'),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).cache()


def test_tumbling_window(events):
    rows = tumbling_window_agg(events, "1 hour").collect()
    by_key = {(r["window_start"].minute + r["window_start"].hour * 60, r["event_type"]): r for r in rows}
    assert by_key[(0, "view")]["n_events"] == 2  # e0 (u1) + e4 (u2) in hour 0
    assert by_key[(0, "view")]["n_users"] == 2
    assert by_key[(60, "view")]["n_events"] == 1  # e3 in hour 1


def test_sliding_window(events):
    rows = sliding_window_agg(events, "1 hour", "30 minutes").collect()
    # event at minute 10 appears in windows starting at -30 and 0
    starts = sorted({r["window_start"] for r in rows})
    assert len(starts) >= 4
    total = sum(r["n_events"] for r in rows)
    assert total == 2 * len(EVENTS)  # each event in exactly 2 sliding windows


def test_sessionize(events):
    rows = sessionize(events, gap_minutes=30).collect()
    u1 = sorted([r for r in rows if r["user_id"] == 1], key=lambda r: r["session_id"])
    assert len(u1) == 2
    assert u1[0]["n_events"] == 3 and u1[0]["sum_value"] == 6.0
    assert u1[1]["n_events"] == 1
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 2


def test_props_and_funnel(events):
    k = {r["event_id"]: r["k_val"] for r in extract_props(events).collect()}
    assert k[0] == 5 and k[5] == 10
    f = {r["user_id"]: r for r in event_type_funnel(events).collect()}
    assert f[1]["view"] == 2 and f[1]["click"] == 1 and f[1]["error"] == 0
    assert f[2]["error"] == 1


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=12)
    feats = media_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: same input → same features
    rows2 = media_features(media, dim=8).collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, rows2))
    frames = frame_sample_plan(media, every_n=4)
    per_vid = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per_vid)  # 12 frames step 4 → 0,4,8


def test_streaming_tumbling_matches_batch(spark, tmp_path, events):
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        windowed_counts_stream,
    )

    path = str(tmp_path / "events_parquet")
    events.write.parquet(path)
    stream = read_events_stream(spark, path)
    result = run_stream_to_memory(
        windowed_counts_stream(stream, "1 hour"), "tumbling_test", "complete"
    )
    batch = tumbling_window_agg(events, "1 hour").select(
        "window_start", "event_type", "n_events", "sum_value"
    )
    assert sorted(map(repr, result.collect())) == sorted(map(repr, batch.collect()))


def test_streaming_sessionize(spark, tmp_path, events):
    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        sessionize_stream,
    )

    path = str(tmp_path / "events_parquet2")
    # One chronologically-sorted file: the file source replays part
    # files in nondeterministic order, and gap-sessionization state is
    # order-sensitive across micro-batches (the streaming analogue of
    # late data; the batch twin + watermark tests cover semantics).
    events.orderBy("ts").coalesce(1).write.parquet(path)
    stream = read_events_stream(spark, path)
    result = run_stream_to_memory(
        sessionize_stream(stream, gap_minutes=30), "session_test", "append",
        # processAllAvailable never settles while processing-time
        # timers are pending — the watchdog IS the exit path here.
        timeout_sec=30,
    )
    # closed sessions only: user 1's first session closes when e3 arrives.
    rows = result.collect()
    closed = [(r["user_id"], r["n_events"], r["sum_value"]) for r in rows]
    assert (1, 3, 6.0) in closed


def test_streaming_sessionize_event_time_flush(spark, tmp_path):
    """Event-time timeout (the production semantics): a user's open
    session must flush when a LATER batch advances the watermark past
    session_end + gap — deterministically, from the data alone, with
    no wall-clock involved. User 1's two 10:00-ish events never close
    by an in-stream gap (no later event for that user); only the
    watermark can emit them."""
    import os

    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        sessionize_stream,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    h10 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    path = str(tmp_path / "et_sessions")

    def _parts():
        return {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    # Batch 0: user 1 has a 2-event session at 10:00-10:10.
    mk(
        [
            (0, h10, 1, "view", 1.0, "{}"),
            (1, h10 + dt.timedelta(minutes=10), 1, "view", 2.0, "{}"),
        ]
    ).coalesce(1).write.parquet(path)
    first = _parts()
    # Batch 1: another user far in the future → watermark (10 min
    # delay) moves to ~13:50, past user 1's horizon 10:10 + 30 min.
    mk([(2, h10 + dt.timedelta(hours=4), 2, "view", 1.0, "{}")]).coalesce(
        1
    ).write.mode("append").parquet(path)
    second = _parts() - first
    for i, group in enumerate((first, second)):
        for f in group:
            os.utime(os.path.join(path, f), (1_700_000_000 + i, 1_700_000_000 + i))

    stream = read_events_stream(spark, path, max_files_per_trigger=1)
    result = run_stream_to_memory(
        sessionize_stream(stream, gap_minutes=30, timeout="event"),
        "et_session_test",
        "append",
    )
    rows = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in result.collect()
    ]
    # user 1's session flushed BY THE WATERMARK (no in-stream closer);
    # user 2's open session stays in state (nothing advanced past it).
    assert rows == [(1, h10, h10 + dt.timedelta(minutes=10), 2, 3.0)]


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """The watermark contract itself: an event arriving in a later
    micro-batch, timestamped behind the watermark, must be EXCLUDED
    from its (already finalized) window — this is what bounds state
    at stream scale, and complete-mode replay tests can't see it."""
    import os

    from bigclam_apachespark_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        windowed_counts_stream,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    h10 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    path = str(tmp_path / "late_events")
    # Batch 1: two events in the 10:00 window + one at 13:00 that
    # advances the watermark (10 min delay → 12:50, far past 11:00).
    def _parts():
        return {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    # Batch 0: two events in the 10:00 window + one at 13:00 that
    # advances the watermark (10 min delay → 12:50, far past 11:00).
    mk(
        [
            (0, h10, 1, "view", 1.0, "{}"),
            (1, h10 + dt.timedelta(minutes=20), 1, "view", 1.0, "{}"),
            (2, h10 + dt.timedelta(hours=3), 1, "view", 1.0, "{}"),
        ]
    ).coalesce(1).write.parquet(path)
    first = _parts()
    # Batch 1: a fresh event; during this batch the 10:00 window
    # (end 11:00 < watermark 12:50) is finalized, emitted, and
    # EVICTED from the state store.
    mk([(3, h10 + dt.timedelta(hours=3, minutes=30), 1, "view", 1.0, "{}")]).coalesce(
        1
    ).write.mode("append").parquet(path)
    second = _parts() - first
    # Batch 2: a LATE event back in the long-evicted 10:00 window —
    # must be dropped, NOT resurrect the window. (Spark merges a late
    # row that lands in the SAME batch as its window's eviction; the
    # drop guarantee applies once the window has been evicted, which
    # is why this arrives a batch later.)
    mk([(4, h10 + dt.timedelta(minutes=15), 1, "view", 99.0, "{}")]).coalesce(
        1
    ).write.mode("append").parquet(path)
    third = _parts() - first - second
    # FileStreamSource replays files oldest-mtime-first; pin the
    # intended order explicitly (writes can land in the same ms).
    for i, group in enumerate((first, second, third)):
        for f in group:
            os.utime(os.path.join(path, f), (1_700_000_000 + i, 1_700_000_000 + i))

    stream = read_events_stream(spark, path, max_files_per_trigger=1)
    result = run_stream_to_memory(
        windowed_counts_stream(stream, "1 hour", watermark="10 minutes"),
        "late_drop_test",
        "append",
    )
    rows = result.collect()
    # Exactly the finalized 10:00 window, WITHOUT the late event: its
    # 99.0 value would show in sum_value had it leaked in, and a
    # resurrected window would add a second 10:00 row.
    assert [(r["window_start"], r["event_type"], r["n_events"], r["sum_value"]) for r in rows] == [
        (h10, "view", 2, 2.0)
    ]


def test_cohort_retention(spark):
    from bigclam_apachespark_spark.operators.events import cohort_retention

    # user 1 active weeks 0 and 2; user 2 active week 0 only;
    # user 3 first appears week 1 and returns week 2
    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-15 00:00:00"),
        (3, 2, "2024-01-02 00:00:00"),
        (4, 3, "2024-01-08 00:00:00"),
        (5, 3, "2024-01-16 00:00:00"),
    ]
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    # weeks are absolute epoch-weeks; normalize to the min cohort
    base = min(k[0] for k in out)
    norm = {(c - base, o): n for (c, o), n in out.items()}
    assert norm[(0, 0)] == 2      # users 1, 2 in cohort week 0
    assert norm[(0, 2)] == 1      # user 1 returns at offset 2
    assert norm[(1, 0)] == 1      # user 3 cohorted at week 1
    assert norm[(1, 1)] == 1      # user 3 returns at offset 1


def test_window_anomaly_scores(spark):
    import math

    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.events import window_anomaly_scores

    # type 'a': counts 2,2,8 across three hours -> the 8 is the spike;
    # type 'b': one window only -> z = 0 by definition
    rows = []
    eid = 0
    for h, n in ((0, 2), (1, 2), (2, 8)):
        for i in range(n):
            rows.append((eid, 1, "a", f"2024-01-01 {h:02d}:10:00")); eid += 1
    rows.append((eid, 2, "b", "2024-01-01 00:30:00"))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = {(r["event_type"], r["n_events"]): r["z_score"]
           for r in window_anomaly_scores(ev).collect()}
    mean, sd = 4.0, math.sqrt(((2-4)**2 + (2-4)**2 + (8-4)**2) / 2)
    assert abs(out[("a", 8)] - round((8 - mean) / sd, 6)) < 1e-9
    assert abs(out[("a", 2)] - round((2 - mean) / sd, 6)) < 1e-9
    assert out[("b", 1)] == 0.0


def test_stream_interval_join_matches_hand_computed(spark, tmp_path):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.streaming import (
        click_attribution_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    # user 1: clicks at 09:10 and 09:50, purchase at 10:00 -> both in
    # the 60-min window; click at 08:30 is outside; user 2's click
    # must not attach to user 1's purchase
    rows = [
        (1, 1, "click", "2024-01-01 08:30:00", 1.0),
        (2, 1, "click", "2024-01-01 09:10:00", 2.0),
        (3, 1, "click", "2024-01-01 09:50:00", 3.0),
        (4, 1, "purchase", "2024-01-01 10:00:00", 9.0),
        (5, 2, "click", "2024-01-01 09:55:00", 4.0),
    ]
    src = str(tmp_path / "events_sij")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).write.parquet(src)

    out = run_stream_to_memory(
        click_attribution_stream(read_events_stream(spark, src)),
        "sij_unit_sink",
        "append",
        timeout_sec=60.0,
    )
    got = sorted((r["purchase_id"], r["click_value"]) for r in out.collect())
    assert got == [(4, 2.0), (4, 3.0)]


def test_stream_interval_join_left_outer_watermark_rule(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: unmatched purchases
    surface with null click columns iff the final global watermark
    W = min(max purchase ts, max click ts) - 2h passes them.
    Fixture: W = 10:00. The 02:00 and 09:50 unmatched purchases emit
    null rows; the 10:30 and 12:00 ones are still in state when the
    bounded replay stops; the matched purchase emits eagerly."""
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.streaming import (
        click_attribution_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    rows = [
        (1, 1, "click", "2024-01-01 01:00:00", 1.0),
        (2, 1, "purchase", "2024-01-01 01:30:00", 9.0),   # matched
        (3, 2, "purchase", "2024-01-01 02:00:00", 9.0),   # null row
        (4, 3, "purchase", "2024-01-01 09:50:00", 9.0),   # null row
        (5, 4, "purchase", "2024-01-01 10:30:00", 9.0),   # >= W: absent
        (6, 98, "purchase", "2024-01-01 12:00:00", 9.0),  # max p_ts: absent
        (7, 99, "click", "2024-01-01 12:00:00", 0.5),     # max c_ts
    ]
    src = str(tmp_path / "events_sij_left")
    # ONE part-file: maxFilesPerTrigger=1 replays files in arbitrary
    # order, and a purchase replayed after the max-ts file would be
    # dropped as late data — the left-outer replay is only
    # deterministic when the fixture is a single batch.
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(src)

    out = run_stream_to_memory(
        click_attribution_stream(read_events_stream(spark, src), how="left_outer"),
        "sij_left_unit_sink",
        "append",
        timeout_sec=90.0,
    )
    got = sorted(
        (r["purchase_id"], r["click_value"] is None) for r in out.collect()
    )
    assert got == [(2, False), (3, True), (4, True)]


def test_ordered_funnel(spark):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.events import ordered_funnel

    rows = [
        # user 1 full ordered funnel
        (1, 1, "view", "2024-01-01 09:00:00"),
        (2, 1, "click", "2024-01-01 09:05:00"),
        (3, 1, "purchase", "2024-01-01 09:10:00"),
        # user 2: purchase BEFORE any click -> stops at stage 2
        (4, 2, "view", "2024-01-01 09:00:00"),
        (5, 2, "purchase", "2024-01-01 09:01:00"),
        (6, 2, "click", "2024-01-01 09:02:00"),
        # user 3: click with no prior view -> stage 0... has a view? no
        (7, 3, "click", "2024-01-01 09:00:00"),
        # user 4: view only
        (8, 4, "view", "2024-01-01 09:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["user_id"]: r["stage"] for r in ordered_funnel(ev).collect()}
    assert out == {1: 3, 2: 2, 3: 0, 4: 1}


def test_hll_count_distinct_accuracy(spark):
    from bigclam_apachespark_spark.operators.sketches import hll_count_distinct

    # 5000 distinct ids at m=256 (expected rel err ~1.04/sqrt(256) = 6.5%)
    df = spark.range(5000).selectExpr("CAST(id AS STRING) AS uid")
    row = hll_count_distinct(df, "uid", b=8).collect()[0]
    assert row["m"] == 256 and row["n_exact"] == 5000
    assert row["rel_err"] < 0.20
    # determinism: identical on re-run
    again = hll_count_distinct(df, "uid", b=8).collect()[0]
    assert again["n_hll"] == row["n_hll"]


def test_gapfill_locf(spark):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.events import gapfill_locf

    # type 'a': hours 09 and 12 active -> 10, 11 are gaps carrying 5.0
    rows = [
        (1, 1, "a", "2024-01-01 09:15:00", 5.0),
        (2, 1, "a", "2024-01-01 12:30:00", 7.0),
        (3, 2, "b", "2024-01-01 09:45:00", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {(r["event_type"], r["window_start"].hour): (r["sum_value"], r["is_gap"])
           for r in gapfill_locf(ev).collect()}
    assert out[("a", 9)] == (5.0, 0)
    assert out[("a", 10)] == (5.0, 1)   # gap, carried forward
    assert out[("a", 11)] == (5.0, 1)
    assert out[("a", 12)] == (7.0, 0)
    assert out[("b", 9)] == (1.0, 0)
    assert ("b", 10) not in out         # span ends at b's last hour


def test_resample_ohlc(spark):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.events import resample_ohlc

    rows = [
        (1, 1, "a", "2024-01-01 09:05:00", 3.0),   # open
        (2, 1, "a", "2024-01-01 09:20:00", 9.0),   # high
        (3, 1, "a", "2024-01-01 09:40:00", 1.0),   # low
        (4, 1, "a", "2024-01-01 09:55:00", 4.0),   # close
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    r = resample_ohlc(ev).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_events"]) == (3.0, 9.0, 1.0, 4.0, 4)


def test_knn_label_eval_separable_clusters(spark):
    from bigclam_apachespark_spark.operators.similarity import knn_label_eval

    # two well-separated label clusters along orthogonal axes: every
    # query's neighbors share its label -> 100% correct, 5 votes each
    rows = []
    for i in range(12):
        base = [0.0] * 8
        if i % 2 == 0:
            base[0] = 1.0 + 0.01 * i
            lbl = 0
        else:
            base[4] = 1.0 + 0.01 * i
            lbl = 1
        rows.append((i, base, lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = knn_label_eval(emb, k=5, n_queries=12).collect()
    assert len(out) == 12
    assert all(r["correct"] == 1 and r["n_votes"] == 5 for r in out)


def test_multi_table_lsh_improves_recall(spark):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        lsh_topk_multi,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where("vec_id < 5")
    truth = brute_force_topk(emb, q, 5).select("q", F.col("vec_id").alias("nn"))

    def recall(got):
        g = got.select("q", F.col("vec_id").alias("nn"))
        return truth.join(g, ["q", "nn"], "left_semi").count() / truth.count()

    single = recall(lsh_topk(emb, q, 5, n_planes=4))
    multi = recall(lsh_topk_multi(emb, q, 5, n_planes=4, n_tables=4))
    # OR-amplification can only widen the candidate set
    assert multi >= single


def test_timestamp_ops_are_timezone_independent(spark):
    """The driver may run the registry under any session timezone;
    every NTZ construction must be timezone-free (epoch-literal
    arithmetic, never a cast through the session zone)."""
    from bigclam_apachespark_spark.operators.events import (
        gapfill_locf,
        resample_ohlc,
    )

    import pyspark.sql.functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        baseline_ohlc = sorted(map(repr, resample_ohlc(ev).collect()))
        baseline_gap = sorted(map(repr, gapfill_locf(ev).collect()))
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert sorted(map(repr, resample_ohlc(ev).collect())) == baseline_ohlc
        assert sorted(map(repr, gapfill_locf(ev).collect())) == baseline_gap
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_type_pivot_hand_computed(spark):
    """Three events over two days pivot into a fixed 5-column count
    matrix with zeros (not NULLs) for absent combinations."""
    from bigclam_apachespark_spark.operators.events import type_pivot

    events = spark.createDataFrame(
        [
            (1, "1970-01-01 05:00:00", 10, "click"),
            (2, "1970-01-01 06:00:00", 11, "click"),
            (3, "1970-01-02 07:00:00", 10, "purchase"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id", "event_type")
    rows = {r.day: r for r in type_pivot(events).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0].click, rows[0].purchase, rows[0].view) == (2, 0, 0)
    assert (rows[1].click, rows[1].purchase) == (0, 1)


def test_dau_wau_trailing_window(spark):
    """User A active day 0 only; user B active days 0 and 3. Day 3:
    dau = {B} = 1, wau (days -3..3 activity, i.e. anyone active in
    the trailing week) = {A, B} = 2 -> stickiness 0.5. Only days
    with actual activity are reported."""
    from bigclam_apachespark_spark.operators.events import dau_wau

    events = spark.createDataFrame(
        [
            (1, "1970-01-01 01:00:00", 1, "view"),
            (2, "1970-01-01 02:00:00", 2, "view"),
            (3, "1970-01-04 01:00:00", 2, "view"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id", "event_type")
    rows = {r.day: r for r in dau_wau(events).collect()}
    assert set(rows) == {0, 3}
    assert (rows[0].dau, rows[0].wau, rows[0].stickiness) == (2, 2, 1.0)
    assert (rows[3].dau, rows[3].wau, rows[3].stickiness) == (1, 2, 0.5)


def test_stream_dedup_within_watermark_collapses_retries(spark, tmp_path):
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.streaming import (
        dedup_within_watermark_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    # at-least-once retries: events 1/2/3 are the same logical event
    # (same user, type, second — different event_id); 4 differs by
    # second, 5 by user, 6 by type → 4 distinct keys survive
    rows = [
        (1, 1, "click", "2024-01-01 09:10:00", 1.0),
        (2, 1, "click", "2024-01-01 09:10:00", 1.0),
        (3, 1, "click", "2024-01-01 09:10:00", 1.0),
        (4, 1, "click", "2024-01-01 09:10:01", 1.0),
        (5, 2, "click", "2024-01-01 09:10:00", 1.0),
        (6, 1, "view", "2024-01-01 09:10:00", 1.0),
    ]
    src = str(tmp_path / "events_ddwm")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).write.parquet(src)

    out = run_stream_to_memory(
        dedup_within_watermark_stream(read_events_stream(spark, src)),
        "ddwm_unit_sink",
        "append",
        timeout_sec=60.0,
    )
    got = {(r["user_id"], r["event_type"], r["sec"]) for r in out.collect()}
    assert len(got) == 4
    secs = {s for _, _, s in got}
    assert len(secs) == 2 and max(secs) - min(secs) == 1


def test_wav_stats_real_decode(spark):
    """REAL WAV decode: synthesize PCM16 mono clips with the stdlib
    wave module (a 440 Hz sine at full scale and a silent clip), run
    them through the Arrow-batched decoder, and check the recovered
    header fields and amplitude stats against the analytic values
    (sine rms = 1/sqrt(2)); a corrupt payload must yield a row-level
    decode_error, not a task failure."""
    import io
    import math
    import struct
    import wave

    from bigclam_apachespark_spark.operators.multimodal import wav_stats

    def make_wav(freq_hz, amp, seconds=0.25, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            n = int(seconds * rate)
            frames = b"".join(
                struct.pack(
                    "<h",
                    int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / rate)),
                )
                for i in range(n)
            )
            w.writeframes(frames)
        return bytearray(buf.getvalue())

    rows = [
        (1, "audio", make_wav(440.0, 1.0)),
        (2, "audio", make_wav(440.0, 0.0)),          # silence
        (3, "audio", bytearray(b"not a riff file")),  # corrupt
        (4, "image", bytearray(b"\x89PNG....")),      # filtered out by kind
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in wav_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    s = got[1]
    assert s["decode_error"] is None
    assert (s["n_channels"], s["sample_rate"], s["n_frames"]) == (1, 8000, 2000)
    assert abs(s["duration_s"] - 0.25) < 1e-9
    assert abs(s["rms"] - 1 / math.sqrt(2)) < 0.01
    assert 0.99 <= s["peak"] <= 1.0
    assert got[2]["rms"] == 0.0 and got[2]["peak"] == 0.0
    assert got[3]["decode_error"] is not None and got[3]["rms"] is None


def test_ppm_features_real_decode(spark):
    """REAL PPM decode: a synthesized 8x8 P6 image with known channel
    values (R=255 everywhere, G=0, B=128) must recover exact means
    and dimensions; a horizontal black/white split must produce a
    pooled grayscale feature with the analytic per-cell values;
    corrupt bytes -> row-level decode_error."""
    from bigclam_apachespark_spark.operators.multimodal import ppm_features

    def make_ppm(w, h, rgb_fn):
        header = f"P6\n{w} {h}\n255\n".encode()
        px = bytearray()
        for y in range(h):
            for x in range(w):
                px.extend(rgb_fn(x, y))
        return bytearray(header + bytes(px))

    flat = make_ppm(8, 8, lambda x, y: (255, 0, 128))
    # left half black, right half white (all channels)
    split = make_ppm(8, 8, lambda x, y: (255, 255, 255) if x >= 4 else (0, 0, 0))
    rows = [
        (1, "image", flat),
        (2, "image", split),
        (3, "image", bytearray(b"JFIF not a ppm")),
        (4, "audio", bytearray(b"RIFF....")),  # filtered by kind
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in ppm_features(df, pool=4).collect()}
    assert set(got) == {1, 2, 3}
    f = got[1]
    assert (f["width"], f["height"]) == (8, 8)
    assert f["mean_r"] == 1.0 and f["mean_g"] == 0.0
    assert abs(f["mean_b"] - 128 / 255) < 1e-6
    s = got[2]
    # 2x2 pooled grid of an 8-wide half split: left cells 0, right 1
    assert s["feature"] == [0.0, 1.0, 0.0, 1.0]
    assert got[3]["decode_error"] is not None


def test_pq_encode_properties(spark):
    """PQ structural guarantees: every vector gets exactly m codes;
    identical vectors encode identically; a vector that IS a
    codebook seed reconstructs its own subvectors exactly (ADC dot
    against itself = true dot in every seeded subspace)."""
    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(
        200
    )
    m, ksub = 16, 8
    cb = S.pq_codebooks(emb, m=m, ksub=ksub)
    assert cb.count() == m * ksub
    codes = S.pq_encode(emb, cb, m=m)
    per_vec = codes.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [m]

    # a seed vector's nearest codeword in each subspace is itself
    # (d2 = 0), so its code row joins back to its own subvector
    from pyspark.sql import functions as F

    seed_ids = [
        r["vec_id"]
        for r in S.quantized(emb)
        .select(
            "vec_id",
            __import__(
                "bigclam_apachespark_spark.functions.hashing",
                fromlist=["hash64"],
            ).hash64(F.col("vec_id").cast("string")).alias("skey"),
        )
        .orderBy("skey", "vec_id")
        .limit(ksub)
        .collect()
    ]
    joined = (
        codes.where(F.col("vec_id").isin(seed_ids))
        .join(cb, ["sub", "code"])
        .join(
            S.quantized(emb).select("vec_id", "qv"), "vec_id"
        )
        .select(
            "vec_id",
            "sub",
            (
                F.slice("qv", F.col("sub") * (64 // m) + 1, 64 // m) == F.col("cqv")
            ).alias("exact"),
        )
    )
    assert all(r["exact"] for r in joined.collect())


def test_pq_recall_improves_with_finer_codes(spark):
    """The (m, ksub) dial must move recall the right way — coarse
    (8, 16) strictly below fine (16, 64) on mean recall@5."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 10")
    coarse = (
        S.pq_recall_eval(emb, q, k=5, m=8, ksub=16)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    fine = (
        S.pq_recall_eval(emb, q, k=5, m=16, ksub=64)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert fine > coarse
    assert fine >= 0.4


def test_png_decode_roundtrip_all_filters():
    """The zlib PNG decoder must reconstruct random images exactly
    for every color type and every row-filter type (including mixed
    filters), driver-side — the pure-numpy contract under
    png_features."""
    import numpy as np

    from bigclam_apachespark_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
    )

    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(13, 9, c), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            dec = _png_decode(_png_encode(img, filters))
            assert dec.shape == img.shape and (dec == img).all(), (c, filters)


def test_png_features_real_decode(spark):
    """REAL PNG decode through the Spark mapInPandas path: encoded
    split images recover exact channel means and pooled cells;
    corrupt bytes and unsupported (interlaced) headers -> row-level
    decode_error, non-image kinds filtered."""
    import struct
    import zlib

    import numpy as np

    from bigclam_apachespark_spark.operators.multimodal import (
        _png_encode,
        png_features,
    )

    split = np.zeros((8, 8, 3), dtype=np.uint8)
    split[:, 4:, :] = 255
    ok = _png_encode(split, filters=[0, 1, 2, 3, 4])

    # flip the interlace byte of a valid PNG -> unsupported, not crash
    interlaced = bytearray(_png_encode(split))
    ihdr_off = 8 + 8  # sig + len/type
    interlaced[ihdr_off + 12] = 1  # interlace flag inside IHDR data
    # fix the CRC so only the interlace flag is "wrong"
    crc = zlib.crc32(b"IHDR" + bytes(interlaced[ihdr_off : ihdr_off + 13])) & 0xFFFFFFFF
    interlaced[ihdr_off + 13 : ihdr_off + 17] = struct.pack(">I", crc)

    rows = [
        (1, "image", bytearray(ok)),
        (2, "image", bytearray(b"\x89PNG\r\n\x1a\nnot really")),
        (3, "image", bytearray(interlaced)),
        (4, "audio", bytearray(b"RIFF....")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in png_features(df, pool=4).collect()}
    assert set(got) == {1, 2, 3}
    f = got[1]
    assert (f["width"], f["height"]) == (8, 8)
    assert f["mean_r"] == 0.5 and f["mean_g"] == 0.5 and f["mean_b"] == 0.5
    assert f["feature"] == [0.0, 1.0, 0.0, 1.0]
    assert f["decode_error"] is None
    assert got[2]["decode_error"] is not None
    assert "interlaced" in got[3]["decode_error"]


def test_stream_hll_registers_match_batch(spark, tmp_path):
    """The streamed per-window HLL registers must equal the batch
    hll_registers computed per hour bucket — same hash, same rank
    arithmetic — and the finalized estimate must be within the
    standard HLL error of the exact distinct count."""
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.sketches import (
        finalize_windowed_hll,
        hll_registers,
    )
    from bigclam_apachespark_spark.streaming import (
        hll_users_windowed_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    rows = [
        (i, (i * 7) % 40, "click", f"2024-01-01 0{i % 3}:{10 + i % 40}:00", 1.0)
        for i in range(120)
    ]
    src = str(tmp_path / "events_shll")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(src)

    regs = run_stream_to_memory(
        hll_users_windowed_stream(read_events_stream(spark, src), "1 hour", b=6),
        "shll_unit_sink",
        "complete",
        timeout_sec=90.0,
    ).localCheckpoint(eager=True)

    batch = spark.read.parquet(src)
    want = {}
    for h in (0, 1, 2):
        hour = batch.where(F.hour("ts") == h)
        for r in hll_registers(hour, "user_id", b=6).collect():
            want[(h, r["bucket"])] = r["register"]
    got = {
        (r["window_start"].hour, r["bucket"]): r["register"]
        for r in regs.collect()
    }
    assert got == want

    est = {r["window_start"].hour: r["n_hll"] for r in
           finalize_windowed_hll(regs, b=6).collect()}
    exact = {
        r["h"]: r["n"]
        for r in batch.groupBy(F.hour("ts").alias("h"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for h, n in exact.items():
        assert abs(est[h] - n) / n < 0.5  # b=6: sigma ~13%, allow 4x


def test_stream_cms_counters_match_batch(spark, tmp_path):
    """The streamed per-window CMS counter table must equal the batch
    cms_counters computed per hour bucket — same md5-derived hashing,
    so counts (not just estimates) are exact — and absent (r, bucket)
    cells must simply be missing (zero), never negative."""
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.sketches import cms_counters
    from bigclam_apachespark_spark.streaming import (
        cms_users_windowed_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    rows = [
        (i, (i * 11) % 25, "click", f"2024-01-01 0{i % 3}:{10 + i % 40}:00", 1.0)
        for i in range(90)
    ]
    src = str(tmp_path / "events_scms")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(src)

    sink = run_stream_to_memory(
        cms_users_windowed_stream(
            read_events_stream(spark, src), "1 hour", d=2, w=64
        ),
        "scms_unit_sink",
        "complete",
        timeout_sec=90.0,
    ).localCheckpoint(eager=True)

    batch = spark.read.parquet(src)
    want = {}
    for h in (0, 1, 2):
        hour = batch.where(F.hour("ts") == h).select(
            F.col("user_id").cast("string").alias("term")
        )
        for r in cms_counters(hour, "term", d=2, w=64).collect():
            want[(h, r["r"], r["bucket"])] = r["c"]
    got = {
        (r["window_start"].hour, r["r"], r["bucket"]): r["c"]
        for r in sink.collect()
    }
    assert got == want
    # every counter row counts at least one occurrence
    assert all(c >= 1 for c in got.values())


def test_ivfpq_composition(spark, tmp_path):
    """IVF-PQ invariants: at full probe width (nprobe = n_cells) the
    candidate set is the whole corpus, so IVF-PQ must equal plain PQ
    exactly; and the persisted index (packed codes, cell-partitioned)
    must reproduce the inline composition bit-for-bit."""
    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    full = S.ivfpq_topk(emb, q, k=5, n_cells=4, nprobe=4, m=8, ksub=16)
    plain = S.pq_topk(emb, q, k=5, m=8, ksub=16)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, plain.collect()))

    path = str(tmp_path / "ivfpq_idx")
    S.write_ivfpq_index(emb, path, n_cells=4, m=8, ksub=16)
    pers = S.ivfpq_topk_persisted(spark, path, q, k=5, nprobe=2, m=8)
    inline = S.ivfpq_topk(emb, q, k=5, n_cells=4, nprobe=2, m=8, ksub=16)
    assert sorted(map(tuple, pers.collect())) == sorted(map(tuple, inline.collect()))


def test_kmeans_centroids_dont_hurt_recall(spark):
    """The Lloyd refinement must never lose to the raw sampled seeds
    on mean recall@5 at the registry config (measured +0.02 at
    sf0.01; ties allowed — the dial is data-dependent)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 10")
    row = (
        S.ivf_recall_compare_kmeans(emb, q, k=5, n_cells=16, nprobe=4, rounds=2)
        .agg(
            F.avg("recall_sampled").alias("s"), F.avg("recall_kmeans").alias("k")
        )
        .collect()[0]
    )
    assert row["k"] >= row["s"]
    assert row["k"] > 0.3


def test_pq_codebooks_kmeans_structure(spark):
    """Per-subspace Lloyd invariants: rounds=0 degenerates to the
    sampled seed codebooks exactly; refined codebooks keep the
    (sub, code) domain within the seed grid and sub_d-length
    codewords; encoding against them still yields m codes/vector."""
    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    m, ksub = 8, 16
    seeds = S.pq_codebooks(emb, m=m, ksub=ksub)
    zero = S.pq_codebooks_kmeans(emb, m=m, ksub=ksub, rounds=0)
    assert sorted(map(tuple, seeds.collect())) == sorted(map(tuple, zero.collect()))

    ref = S.pq_codebooks_kmeans(emb, m=m, ksub=ksub, rounds=2)
    rows = ref.collect()
    assert all(0 <= r["sub"] < m and 0 <= r["code"] < ksub for r in rows)
    assert all(len(r["cqv"]) == 64 // m for r in rows)
    codes = S.pq_encode(emb, ref, m=m)
    per_vec = codes.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [m]


def test_mmr_rerank_prefers_diverse_candidate(spark):
    """MMR semantics on a 3-candidate fixture: plain top-2 would be
    {A, B} (B nearly duplicates A), but MMR's second pick is the
    diverse C; rank-1 mmr_score is plain relevance."""
    from bigclam_apachespark_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0]),       # the query
        (1, [0.9, 0.436]),     # A: rel ~0.89996
        (2, [0.88, 0.47]),     # B: rel ~0.8821, near-dup of A (sim ~0.9992)
        (3, [0.9, -0.436]),    # C: rel ~0.8996 mirrored, sim to A ~0.62
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id = 0")
    out = {
        r["sel_rank"]: r
        for r in mmr_rerank(emb, queries, k=2, n_cand=3).collect()
    }
    # A and C tie on rel (0.899957); vec_id breaks the tie -> A first
    assert out[1]["vec_id"] == 1
    assert out[1]["mmr_score"] == 0.899957
    # step 2: score(B) = .5*0.8821 - .5*0.9992 < 0 < score(C) ~ 0.14
    assert out[2]["vec_id"] == 3


def test_topk_per_window_ties_and_cap(spark):
    import datetime as dt

    from bigclam_apachespark_spark.operators.events import topk_per_window

    t0 = dt.datetime(2024, 1, 1, 0, 10)
    t1 = dt.datetime(2024, 1, 1, 1, 10)  # second window
    rows = (
        [(t0, 1)] * 3 + [(t0, 2)] * 2 + [(t0, 3)] * 2 + [(t0, 4)]
        + [(t1, 9)]
    )
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = sorted(
        topk_per_window(ev, k=2).collect(),
        key=lambda r: (r["window_start"], r["rank"]),
    )
    got = [(r["user_id"], r["n_events"], r["rank"]) for r in out]
    # window 0: user 1 (3 events) then the 2-vs-2 tie broken by id;
    # user 4 is cut by k; window 1 has its lone user
    assert got == [(1, 3, 1), (2, 2, 2), (9, 1, 1)]


def test_cdc_upsert_stream_multibatch_converges(spark, tmp_path):
    """foreachBatch CDC apply across MULTIPLE micro-batches (one file
    per trigger) must converge to the single batch merge: updates
    replace, inserts append, untouched rows carry over — regardless
    of how the feed splits into batches."""
    import pyspark.sql.functions as F

    from bigclam_apachespark_spark.operators.relational import upsert_merge
    from bigclam_apachespark_spark.streaming import cdc_upsert_stream

    snapshot = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 30.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    upd1 = spark.createDataFrame(
        [(2, "U", 21.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    upd2 = spark.createDataFrame(
        [(4, "N", 40.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    feed_dir = str(tmp_path / "feed")
    # two separate files -> two micro-batches at maxFilesPerTrigger=1
    upd1.coalesce(1).write.mode("append").parquet(feed_dir)
    upd2.coalesce(1).write.mode("append").parquet(feed_dir)
    stream = (
        spark.readStream.schema(snapshot.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    got = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in cdc_upsert_stream(
            spark, snapshot, stream, str(tmp_path / "target")
        ).collect()
    }
    want = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in upsert_merge(
            snapshot, upd1.unionByName(upd2)
        ).collect()
    }
    assert got == want == {
        1: ("A", 10.0), 2: ("U", 21.0), 3: ("B", 30.0), 4: ("N", 40.0)
    }


def test_session_window_boundary_matches_islands(spark):
    """Spark's built-in session_window merges INCLUSIVELY at the gap
    boundary: an event arriving exactly `gap` later EXTENDS the
    session — the same strict-> rule as the islands sessionize (this
    pins the semantics the oracle's `> 1800` flag encodes). An event
    one second past the boundary opens a new session in both, and
    session_end reports last-event + gap."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.events import (
        session_window_agg,
        sessionize,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        # EXACTLY 30 min later -> same session in both operators
        (1, t0 + dt.timedelta(minutes=30), 1, "view", 1.0, "{}"),
        # 30 min + 1 s after the second -> new session in both
        (2, t0 + dt.timedelta(minutes=60, seconds=1), 1, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sw = sorted(
        session_window_agg(ev, gap="30 minutes").collect(),
        key=lambda r: r["session_start"],
    )
    isl = sessionize(ev, gap_minutes=30).collect()
    assert len(sw) == 2 and len(isl) == 2
    assert sw[0]["n_events"] == 2   # boundary event merged
    assert sw[1]["n_events"] == 1
    # half-open close: last event + gap
    assert sw[0]["session_end"] == t0 + dt.timedelta(minutes=60)


def test_hll_sliding_merge_equals_rescan(spark):
    """Sketch mergeability: the trailing-3h estimate from MERGED
    hourly registers must equal the estimate computed from scratch
    over each trailing window's raw rows (max-merge of per-hour
    register maxima IS the window's register table)."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.sketches import (
        _finalize_registers,
        hll_registers,
        hll_sliding_estimate,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, (i * 13) % 37, "view",
         t0 + dt.timedelta(hours=i % 5, minutes=(i * 7) % 60), 1.0, "{}")
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double, props string",
    )
    got = {
        r["window_start"]: r["n_hll_trailing"]
        for r in hll_sliding_estimate(ev, hours=3, b=6).collect()
    }
    for h in range(5):
        lo = t0 + dt.timedelta(hours=h - 2)
        hi = t0 + dt.timedelta(hours=h + 1)
        window_rows = ev.where((F.col("ts") >= lo) & (F.col("ts") < hi))
        regs = hll_registers(window_rows, "user_id", b=6)
        agg, est = _finalize_registers(regs, 64)
        want = agg.select(F.round(est, 6).alias("e")).collect()[0]["e"]
        assert got[t0 + dt.timedelta(hours=h)] == want


def test_jl_project_matches_numpy_reference(spark):
    """The Spark-side JL projection must equal R·q computed in plain
    Python over the same sign matrix and the same micro-unit
    quantization — exact integer equality, component by component."""
    from bigclam_apachespark_spark.operators.similarity import (
        _jl_signs,
        jl_project,
    )

    dim, k_dim = 8, 4
    rows = [
        (0, [0.1, -0.2, 0.3, -0.4, 0.5, -0.6, 0.7, -0.8]),
        (1, [1.0, 1.0, 0.0, 0.0, -1.0, -1.0, 0.5, 0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["pqv"], r["pnrm"])
        for r in jl_project(df, k_dim=k_dim, dim=dim).collect()
    }
    signs = _jl_signs(k_dim, dim)
    for vid, vec in rows:
        q = [int(round(x * 1_000_000)) for x in vec]
        want = [sum(s * q[d] for d, s in enumerate(row)) for row in signs]
        assert got[vid][0] == want
        assert got[vid][1] == pytest.approx(
            math.sqrt(sum(c * c for c in want)), rel=1e-12
        )


def test_jl_topk_full_rank_identity(vecs):
    """With k_dim = dim the sparse sign matrix is still a linear map,
    but recall against brute force is measured, not assumed: on the
    4-dim fixture the near-dup of the query must surface at rank 1
    (JL preserves the big gap between cos≈1 and cos≈0 neighbors)."""
    from bigclam_apachespark_spark.operators.similarity import jl_topk

    q = vecs.where(F.col("vec_id") == 0)
    top = jl_topk(vecs, q, k=2, k_dim=4, dim=4, vec_col="embedding")
    rows = sorted((r["rank"], r["vec_id"]) for r in top.collect())
    assert rows[0] == (1, 1)


def test_jl_recall_eval_contract(vecs):
    """Recall rows cover every truth query, n_hits ≤ n_retrieved ≤ k,
    recall = n_hits / k."""
    from bigclam_apachespark_spark.operators.similarity import jl_recall_eval

    q = vecs.where(F.col("vec_id") < 2)
    got = jl_recall_eval(vecs, q, k=2, k_dim=4, dim=4, vec_col="embedding").collect()
    assert {r["q"] for r in got} == {0, 1}
    for r in got:
        assert 0 <= r["n_hits"] <= r["n_retrieved"] <= 2
        assert r["recall"] == round(r["n_hits"] / 2.0, 6)


def test_cohort_ltv_hand_computed(spark):
    """Cohort W = {u1, u2} (size 2), cohort W+1 = {u3} (size 1).
    u1 buys $10 in week W and $5.50 in W+1; u3 buys $2. LTV per
    user cumulates within each cohort: W → 5.0 then 7.75; W+1 → 2.0.
    u2 never buys but still counts in the denominator — that's the
    point of cohorting."""
    from bigclam_apachespark_spark.operators.events import cohort_ltv

    W = dt.datetime(2024, 1, 4)   # within some epoch-week
    W1 = W + dt.timedelta(days=7)
    rows = [
        (1, W, 1, "signup", 0.0, "{}"),
        (2, W, 2, "signup", 0.0, "{}"),
        (3, W, 1, "purchase", 10.0, "{}"),
        (4, W1, 1, "purchase", 5.50, "{}"),
        (5, W1, 3, "signup", 0.0, "{}"),
        (6, W1, 3, "purchase", 2.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.cohort_week, r.week_offset): r for r in cohort_ltv(ev).collect()
    }
    wks = sorted({cw for cw, _ in got})
    w0, w1 = wks[0], wks[-1]
    assert w1 == w0 + 1
    r00 = got[(w0, 0)]
    assert (r00.cohort_size, r00.wk_revenue, r00.cum_ltv_per_user) == (2, 10.0, 5.0)
    r01 = got[(w0, 1)]
    assert (r01.cohort_size, r01.wk_revenue, r01.cum_ltv_per_user) == (2, 5.5, 7.75)
    r10 = got[(w1, 0)]
    assert (r10.cohort_size, r10.wk_revenue, r10.cum_ltv_per_user) == (1, 2.0, 2.0)
    assert len(got) == 3


def _ppm_bytes(cols_black: int) -> bytearray:
    row = bytes([0, 0, 0] * cols_black + [255, 255, 255] * (8 - cols_black))
    return bytearray(b"P6\n8 8\n255\n" + row * 8)


def test_phash64_closed_form(spark):
    """aHash of a split image equals colmask(s)·0x0101…01 (signed):
    columns x ≥ s are above the mean for 1 ≤ s ≤ 7; the all-white
    image hashes to 0 under the strict > threshold."""
    from bigclam_apachespark_spark.operators.multimodal import phash64

    media = spark.createDataFrame(
        [(0, "image", _ppm_bytes(0)), (2, "image", _ppm_bytes(2))],
        "media_id long, kind string, payload binary",
    )
    got = {r["media_id"]: r for r in phash64(media).collect()}
    assert got[0]["phash"] == 0
    want = ((0xFF << 2) & 0xFF) * 0x0101010101010101
    want = want - (1 << 64) if want >= 1 << 63 else want
    assert got[2]["phash"] == want
    assert all(r["decode_error"] is None for r in got.values())


def test_phash_near_dup_pairs_and_corrupt_payload(spark):
    """Identical images pair at hamming 0; a far split (0 vs 4 →
    hamming 32) never pairs; a corrupt payload reports decode_error
    and is excluded from pairing instead of failing the job."""
    from bigclam_apachespark_spark.operators.multimodal import (
        phash64,
        phash_near_dup,
    )

    media = spark.createDataFrame(
        [
            (1, "image", _ppm_bytes(4)),
            (2, "image", _ppm_bytes(4)),
            (3, "image", _ppm_bytes(0)),
            (4, "image", bytearray(b"NOT A PPM")),
        ],
        "media_id long, kind string, payload binary",
    )
    errs = {r["media_id"]: r["decode_error"] for r in phash64(media).collect()}
    assert errs[4] is not None and errs[1] is None
    pairs = phash_near_dup(media, bands=4, max_hamming=3).collect()
    assert [(r.a, r.b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_video_frame_hashes_and_near_dup(spark):
    """Hand-built 2-frame containers: video A and B share frame
    content (split 2 then 3), video C pans elsewhere (5, 6). With
    every_n=1 and min_matching=2, only (A, B) pairs; C matches
    nobody. A truncated container yields no rows instead of
    failing."""
    from bigclam_apachespark_spark.operators.multimodal import (
        VIDEO_MAGIC,
        video_frame_hashes,
        video_near_dup,
    )

    def frame(s):
        return (bytes([0, 0, 0] * s + [255, 255, 255] * (8 - s))) * 8

    def vid(*splits):
        return bytearray(
            VIDEO_MAGIC + bytes([len(splits)]) + b"".join(frame(s) for s in splits)
        )

    media = spark.createDataFrame(
        [
            (1, "video", vid(2, 3)),
            (2, "video", vid(2, 3)),
            (3, "video", vid(5, 6)),
            (4, "video", bytearray(b"VID0\x02short")),
        ],
        "media_id long, kind string, payload binary",
    )
    fh = video_frame_hashes(media, every_n=1).collect()
    assert {r.media_id for r in fh} == {1, 2, 3}
    assert len([r for r in fh if r.media_id == 1]) == 2
    pairs = video_near_dup(media, every_n=1, min_matching=2).collect()
    assert [(r.a, r.b, r.n_matching) for r in pairs] == [(1, 2, 2)]


def test_embedding_components_transitive_merge(vecs):
    """Transitivity is the point: at threshold 0.9 the two near-dup
    pairs form two separate components; at 0.5 the diagonal vector 4
    bridges everything into ONE component labeled by the min id —
    exactly what pair output alone cannot express."""
    from bigclam_apachespark_spark.operators.similarity import (
        embedding_components,
    )

    tight = embedding_components(
        vecs, threshold=0.9, n_planes=2, dim=4, vec_col="embedding"
    ).collect()
    by_comp = {}
    for r in tight:
        by_comp.setdefault(r["component"], set()).add(r["vec_id"])
    assert by_comp == {0: {0, 1}, 2: {2, 3}}
    assert all(r["n_members"] == 2 for r in tight)

    loose = embedding_components(
        vecs, threshold=0.5, n_planes=1, dim=4, vec_col="embedding"
    ).collect()
    assert {r["component"] for r in loose} == {0}
    assert {r["vec_id"] for r in loose} == {0, 1, 2, 3, 4}
    assert all(r["n_members"] == 5 for r in loose)


def test_session_funnel_order_sensitivity(spark):
    """The order test is the point: u1 clicks then purchases →
    converts; u2 purchases then clicks → counted as clicked but NOT
    converted; u3 click and purchase in the SAME second resolve by
    event_id (purchase id greater → converts); u4 never clicks."""
    from bigclam_apachespark_spark.operators.events import session_funnel

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        (1, s(0), 1, "click", 0.0, "{}"),
        (2, s(60), 1, "purchase", 5.0, "{}"),
        (3, s(0), 2, "purchase", 5.0, "{}"),
        (4, s(60), 2, "click", 0.0, "{}"),
        (5, s(0), 3, "click", 0.0, "{}"),
        (6, s(0), 3, "purchase", 1.0, "{}"),
        (7, s(0), 4, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = session_funnel(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_sessions, r.n_with_click, r.n_converted) == (4, 3, 2)
    assert r.conv_rate == round(2 / 3, 6)


def test_robust_outliers_hand_computed(spark):
    """Values [1..7, 1000] for one type, n=8: median = the ceil(4)-th
    order statistic = 4; deviations sorted [0,1,1,2,2,3,3,996] →
    MAD = 2 (4th); outliers beyond 3·MAD=6 from median: only 1000.
    The mean/std z-score would drag the mean to ~128 and flag
    nothing at z=3 — that's why MAD."""
    from bigclam_apachespark_spark.operators.events import robust_outliers

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "click", float(v), "{}")
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = robust_outliers(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.med, r.mad, r.n_outliers) == (4.0, 2.0, 1)


def test_kmv_exact_below_k_and_estimate_above(spark):
    """A group with fewer than k distinct values reports EXACTLY
    (the sketch degenerates to the set); a group with >= k distinct
    values estimates within a loose sanity band (k=8 → ~35% std
    error; the registry config uses k=64)."""
    from bigclam_apachespark_spark.operators.sketches import (
        kmv_count_distinct_by,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i % 3, "small", 0.0, "{}") for i in range(30)]
    rows += [(100 + i, t0, i, "big", 0.0, "{}") for i in range(200)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.event_type: r for r in
           kmv_count_distinct_by(ev, "event_type", "user_id", k=8).collect()}
    assert (got["small"].n_exact, got["small"].n_kmv, got["small"].rel_err) == (
        3, 3.0, 0.0,
    )
    big = got["big"]
    assert big.n_exact == 200
    assert 80 <= big.n_kmv <= 500  # sanity band, not a precision claim


def test_time_to_convert_first_click_first_purchase_after(spark):
    """u1: click at t+0, purchases at t+100 and t+10 → latency uses
    the FIRST qualifying purchase (10 s). u2's only purchase
    precedes its click → never converts. Quantiles select from
    {10} → every p returns 10 with n_converted 1."""
    from bigclam_apachespark_spark.operators.events import time_to_convert

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        (1, s(0), 1, "click", 0.0, "{}"),
        (2, s(100), 1, "purchase", 1.0, "{}"),
        (3, s(10), 1, "purchase", 1.0, "{}"),
        (4, s(50), 2, "purchase", 1.0, "{}"),
        (5, s(60), 2, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = time_to_convert(ev).collect()
    assert [(r.p, r.latency_sec, r.n_converted) for r in got] == [
        (0.5, 10, 1), (0.9, 10, 1), (0.99, 10, 1),
    ]


def test_ivf_upsert_equals_frozen_centroid_serving(spark, tmp_path):
    """Incremental maintenance contract: building the index on the
    base corpus and APPENDING the delta (frozen centroids) must serve
    exactly what a single-shot index over the full corpus with the
    SAME centroids serves — i.e. the append loses nothing, moves
    nothing, and re-assigns nothing. Also: the upsert must not
    rewrite base cells (file count in untouched cells only grows by
    the delta's own files)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 10 != 0)
    delta = emb.where(F.col("vec_id") % 10 == 0)
    q = emb.where("vec_id < 5")

    path = str(tmp_path / "ivf_upsert")
    S.write_ivf_index(base, path, n_cells=4)
    S.append_ivf_index(spark, delta, path)
    got = S.ivf_topk_persisted(spark, path, q, k=5, nprobe=2)

    # reference: same frozen (base-sampled) centroids, full corpus
    cent = S.ivf_centroids(base, n_cells=4)
    corpus = S.ivf_assign(emb, cent, keep_vec=True)
    want = S._ivf_search(cent, corpus, q, 5, 2, "vec_id", "embedding")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bpe_merge_step_tiny_fixture(spark):
    """Hand-computed BPE round: corpus = 'abab abab ab' per doc.
    Round-1 pair counts over words {abab: 2n, ab: n}: ('a','b') = 5n,
    ('b','a') = 2n → best merge = 'ab'. After the merge every word is
    marker-only, so remaining adjacent pairs are ('ab','ab') from the
    former 'abab' words — count 2n and nothing else."""
    from bigclam_apachespark_spark.operators.text import bpe_merge_step

    docs = spark.createDataFrame(
        [(i, "abab abab ab") for i in range(3)], "doc_id long, text string"
    )
    rows = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in bpe_merge_step(docs, k=10).collect()
    }
    assert rows == {("ab", "ab"): 6}


def test_histogram_quantile_sketch_bounds(spark):
    """The sketch estimate must land within one bin width of the
    exact quantile (the histogram error bound), and n must equal the
    non-null value count per type."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.sketches import (
        histogram_quantile_sketch,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = histogram_quantile_sketch(ev, ps=(0.5, 0.9), n_bins=32).collect()
    assert out, "no sketch rows"
    # bin width per type (same arithmetic as the operator)
    rng = {
        r.event_type: (r.mx - r.mn) // 32 + 1
        for r in ev.where(F.col("value").isNotNull())
        .select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
        )
        .groupBy("event_type")
        .agg(F.min("vc").alias("mn"), F.max("vc").alias("mx"))
        .collect()
    }
    n_true = {
        r.event_type: r.n
        for r in ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in out:
        assert r.n == n_true[r.event_type]
        assert r.abs_err_cents <= rng[r.event_type], (
            r.event_type,
            r.p,
            r.abs_err_cents,
            rng[r.event_type],
        )


def test_sq8_encode_round_half_up_and_zero_range(spark):
    """SQ8 codes by hand: dim 0 spans [0, 1e6] micro-units → codes
    {0, 128, 255} for x ∈ {0.0, 0.5, 1.0} (0.5 → 127.5 rounds HALF-UP
    to 128 via the exact (2·255·v + rng) // (2·rng) integer form);
    dim 1 is constant (rng = 0) → code 0 everywhere."""
    from bigclam_apachespark_spark.operators.similarity import sq8_encode

    emb = spark.createDataFrame(
        [(1, [0.0, 0.7]), (2, [0.5, 0.7]), (3, [1.0, 0.7])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: list(r.codes) for r in sq8_encode(emb).collect()}
    assert got == {1: [0, 0], 2: [128, 0], 3: [255, 0]}


def test_sq8_topk_matches_exact_on_reconstructible_grid(spark):
    """Vectors whose coordinates sit exactly on the 255-step grid
    reconstruct losslessly, so SQ8 ranking must equal brute force —
    the exactness anchor under the recall row (which measures the
    lossy case)."""
    from bigclam_apachespark_spark.operators.similarity import (
        brute_force_topk,
        sq8_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id = 0")
    exact = [(r.q, r.vec_id, r.rank) for r in
             brute_force_topk(emb, queries, k=3).collect()]
    sq8 = [(r.q, r.vec_id, r.rank) for r in
           sq8_topk(emb, queries, k=3).collect()]
    assert sq8 == exact


def test_bloom_no_false_negatives_and_bit_budget(spark):
    """Bloom invariants by hand: (a) a bitmap built from a key set
    flags EVERY member on probe (zero false negatives, the filter's
    defining guarantee); (b) a 1-key bitmap sets at most k bits;
    (c) the measured FPR over non-members is 0 at design size
    (m=2^16, k=7, 50 keys: (1-e^{-kn/m})^k ~ 1e-15)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.sketches import (
        bloom_bitmap,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"key-{i}",) for i in range(50)], "key string"
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "key string"
    )
    bitmap = bloom_bitmap(members, "key").cache()

    hits = bloom_probe(members, "key", bitmap, ["key"]).collect()
    assert len(hits) == 50 and all(r.bloom_hit for r in hits)

    misses = bloom_probe(others, "key", bitmap, ["key"]).collect()
    assert sum(r.bloom_hit for r in misses) == 0
    bitmap.unpersist()

    one = bloom_bitmap(
        spark.createDataFrame([("solo",)], "key string"), "key", k=7
    ).collect()
    n_bits = sum(bin(r.bits & 0xFFFFFFFF).count("1") for r in one)
    assert 1 <= n_bits <= 7


def test_bloom_decontam_report_exactness(spark):
    """The report's exact-membership column is ground truth: on the
    sf0.001 documents table, n_missed MUST be 0 (no false negatives)
    in both configs, n_exact_hits must equal an independently
    computed fingerprint semi-join count, and the undersized config's
    bloom hits must be a superset count of the exact hits."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.functions.hashing import (
        hash64,
        normalize_text,
    )
    from bigclam_apachespark_spark.operators.sketches import (
        bloom_decontam_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = docs.select("doc_id", hash64(normalize_text("text")).alias("fp"))
    bench = fp.where(F.col("doc_id") % 13 == 0).select("fp").distinct()
    probe = fp.where(F.col("doc_id") % 13 != 0)
    n_exact = probe.join(bench, "fp", "left_semi").count()
    n_probe = probe.count()

    for m_bits, k in ((1 << 16, 7), (1 << 8, 2)):
        row = bloom_decontam_report(docs, m_bits=m_bits, k=k).collect()[0]
        assert row.n_probed == n_probe
        assert row.n_exact_hits == n_exact
        assert row.n_missed == 0, (m_bits, k, row)
        assert row.n_bloom_hits >= row.n_exact_hits


def test_stream_bloom_admission_matches_batch_and_never_rejects_novel_members(spark):
    """The streamed Bloom admission set must (a) equal the batch
    probe verdict computed by bloom_probe on the same filter, and
    (b) never contain a document whose fingerprint IS in the
    benchmark (no false negatives ⇒ every true member is rejected)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.functions.hashing import (
        hash64,
        normalize_text,
    )
    from bigclam_apachespark_spark.operators.sketches import (
        bloom_bitmap,
        bloom_probe,
    )
    from bigclam_apachespark_spark.registry import QUERIES

    admitted = {
        r.doc_id
        for r in QUERIES["dedup_stream_bloom"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = docs.select(
        "doc_id", hash64(normalize_text("text")).cast("string").alias("key")
    )
    bench = fp.where(F.col("doc_id") % 13 == 0)
    probe = fp.where(F.col("doc_id") % 13 != 0)
    bitmap = bloom_bitmap(bench.select("key"), "key", m_bits=256, k=2)
    batch = bloom_probe(probe, "key", bitmap, ["doc_id"], m_bits=256, k=2)
    batch_admitted = {
        r.doc_id for r in batch.where(~F.col("bloom_hit")).collect()
    }
    assert admitted == batch_admitted

    members = {
        r.doc_id
        for r in probe.join(
            bench.select("key").distinct(), "key", "left_semi"
        ).collect()
    }
    assert not (admitted & members)


def test_ivfpq_residual_exact_when_codebook_covers_corpus(spark):
    """With ksub >= |corpus| every vector's residual is its own
    codeword and with nprobe = n_cells nothing is pruned, so the
    residual-ADC decomposition dot(q,c) + sum(part) over
    ||c||^2 + sum(2*cross + ||r||^2) must reproduce the EXACT cosine
    ranking and scores — the arithmetic identity behind the
    operator, verified end to end."""
    import hashlib

    from bigclam_apachespark_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_residual_topk,
    )

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest()
        return [((b % 17) - 8) / 10.0 for b in h[:8]]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.where("vec_id < 3")
    exact = {
        (r.q, r.rank): (r.vec_id, r.cos_sim)
        for r in brute_force_topk(emb, queries, k=4).collect()
    }
    got = {
        (r.q, r.rank): (r.vec_id, r.adc_cos)
        for r in ivfpq_residual_topk(
            emb, queries, k=4, n_cells=4, nprobe=4, m=4, ksub=20, dim=8
        ).collect()
    }
    assert set(got) == set(exact)
    for key, (vid, cos) in exact.items():
        gvid, gcos = got[key]
        assert gvid == vid, (key, vid, gvid)
        assert abs(gcos - cos) < 2e-6, (key, cos, gcos)


def test_kmeanspp_init_properties(spark):
    """k-means|| invariants on the sf0.001 embeddings: exactly k
    cells densely ranked by (weight DESC, id), weights sum to the
    corpus size when every point's nearest candidate survives the
    top-k cut is NOT guaranteed — but every returned weight must be
    >= 1 and the centers must be distinct corpus ids; and the
    measured inertia must BEAT (or tie) the md5-sample init's —
    D²-weighted oversampling cannot lose to a uniform sample of the
    same k on the same metric it optimizes (asserted on the shipped
    fixture, where it holds)."""
    from bigclam_apachespark_spark.operators.similarity import (
        kmeanspp_candidates,
        kmeanspp_inertia_compare,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = kmeanspp_candidates(emb, k=8, oversample=16, rounds=3).collect()
    assert len(out) == 8
    assert sorted(r.cell for r in out) == list(range(8))
    assert len({r.vec_id for r in out}) == 8
    weights = [r.weight for r in sorted(out, key=lambda r: r.cell)]
    assert weights == sorted(weights, reverse=True)
    assert all(w >= 1 for w in weights)

    inert = {
        r.method: r.inertia
        for r in kmeanspp_inertia_compare(
            emb, k=8, oversample=16, rounds=3
        ).collect()
    }
    assert inert["kmeanspp"] <= inert["md5_sample"], inert


def test_equidepth_bins_hand_computed(spark):
    """12 values of one type, 4 bins: boundaries at ceil(k*12/4) =
    ranks 3/6/9 → values 30/60/90; bin = #{boundaries < vc}, so vc=30
    lands in bin 0 (not strictly above its own boundary) and each bin
    holds exactly 3 rows on this tie-free fixture."""
    from bigclam_apachespark_spark.operators.events import equidepth_bins

    rows = [
        ("buy", i, "2024-01-01 00:00:00", float(i * 10) / 100)
        for i in range(1, 13)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, ts string, value double"
    ).selectExpr(
        "event_type", "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    got = {
        r.bin: (r.n_rows, r.lo_cents, r.hi_cents)
        for r in equidepth_bins(ev, n_bins=4).collect()
    }
    assert got == {
        0: (3, 10, 30),
        1: (3, 40, 60),
        2: (3, 70, 90),
        3: (3, 100, 120),
    }


def test_wav_spectral_dominant_bin_and_corrupt_payload(spark):
    """The FFT path must find the integer-cycle sine's exact bin on
    every fixture clip, and a corrupt payload must surface a
    row-level decode_error with NULL features instead of failing the
    batch."""
    from bigclam_apachespark_spark.operators.multimodal import (
        synthetic_sine_media,
        wav_spectral,
    )

    media = synthetic_sine_media(spark, n=16)
    rows = {r.media_id: r for r in wav_spectral(media).collect()}
    for i in range(16):
        assert rows[i].dominant_bin == 3 + i % 13
        assert rows[i].decode_error is None

    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"RIFFgarbage"))],
        "media_id long, kind string, payload binary",
    )
    out = wav_spectral(bad).collect()[0]
    assert out.decode_error is not None and out.dominant_bin is None


def test_counting_topk_stream_matches_batch_under_splits(spark, tmp_path):
    """The foreachBatch count merge must equal the one-shot batch
    count regardless of how many micro-batches the replay used
    (maxFilesPerTrigger=1 over a multi-file staging forces real
    splits)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.streaming.cdc_stream import (
        counting_topk_stream,
    )

    ev = spark.range(300).select(
        (F.col("id") % 7).alias("user_id")
    )
    src = str(tmp_path / "src")
    ev.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {
        (r.user_id, r.n, r.rank)
        for r in counting_topk_stream(
            spark, stream, "user_id", str(tmp_path / "state"), k=3
        ).collect()
    }
    # 300 rows over 7 users: users 0..6 get ceil/floor counts; top-3
    # deterministic by (n DESC, user_id): users 0,1,2 with 43 each
    assert got == {(0, 43, 1), (1, 43, 2), (2, 43, 3)}


def test_cms_topk_stream_matches_batch_under_splits(spark, tmp_path):
    """The CMS variant (VERDICT r11 ask #8): the bounded-state
    foreachBatch sketch merge must produce, under a REAL multi-batch
    replay (5 files, maxFilesPerTrigger=1), the identical head to a
    one-shot CMS computed over the whole feed — counters add
    commutatively and the candidate bound (here deliberately tiny,
    8 over 7 distinct keys + margin) retains every key whose final
    estimate makes the head. Also: n_cms >= n_exact per key (CMS
    never under-counts)."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.sketches import cms_counters
    from bigclam_apachespark_spark.streaming.cdc_stream import cms_topk_stream

    ev = spark.range(300).select((F.col("id") % 7).alias("user_id"))
    src_dir = str(tmp_path / "src")
    ev.repartition(5).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    got = {
        (r.user_id, r.n_cms, r.rank)
        for r in cms_topk_stream(
            spark, stream, "user_id", str(tmp_path / "state"),
            k=3, candidates=8,
        ).collect()
    }
    # one-shot twin: full-feed counters + estimate + same head order
    from bigclam_apachespark_spark.functions.hashing import hash64

    toks = ev.select(F.col("user_id").cast("string").alias("term"))
    counters = cms_counters(toks, "term", 4, 1024)
    probes = ev.select("user_id").distinct().select(
        "user_id",
        F.explode(
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
                            % 1024
                        ).cast("int").alias("bucket"),
                    )
                    for r in range(4)
                ]
            )
        ).alias("p"),
    ).select("user_id", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
    est = (
        probes.join(counters, ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("n_cms"))
    )
    exp_rows = est.orderBy(F.col("n_cms").desc(), "user_id").limit(3).collect()
    exp = {(r.user_id, r.n_cms, i + 1) for i, r in enumerate(exp_rows)}
    assert got == exp
    # CMS never under-counts: estimate >= exact count for every key
    exact = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for r in est.collect():
        assert r.n_cms >= exact[r.user_id]


def test_changepoint_finds_planted_shift(spark):
    """A series with 5 events/day for days 0..9 and 50/day for days
    10..19 must locate the changepoint at day 9 (the cumulative-count
    ramp deviates most at the last pre-shift day), with the
    hand-computed deviation value."""
    from bigclam_apachespark_spark.operators.events import changepoint_scan

    rows = []
    eid = 0
    for day in range(20):
        per = 5 if day < 10 else 50
        for _ in range(per):
            rows.append(
                ("buy", eid, day * 86400 + 10, 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, sec long, value double"
    ).selectExpr(
        "event_type", "event_id", "timestamp_seconds(sec) AS ts", "value"
    )
    out = changepoint_scan(ev).collect()[0]
    # by hand: n_days=20, n_total=550; at day 9 (i=10): s_i=50,
    # dev = |20*50 - 10*550| = 4500 — the maximum
    assert (out.cp_day, out.n_days, out.n_total, out.dev_num) == (9, 20, 550, 4500)


def test_seasonal_naive_backtest_hand_computed(spark):
    """14 days, 10/day in week one and 13/day in week two: every
    scored day (7..13) has pred = 10, actual = 13 -> MAE = bias =
    3000 milli over exactly 7 scored days."""
    from bigclam_apachespark_spark.operators.events import (
        seasonal_naive_backtest,
    )

    rows = []
    eid = 0
    for day in range(14):
        for _ in range(10 if day < 7 else 13):
            rows.append(("buy", eid, day * 86400 + 5, 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, sec long, value double"
    ).selectExpr(
        "event_type", "event_id", "timestamp_seconds(sec) AS ts", "value"
    )
    out = seasonal_naive_backtest(ev, lag_days=7).collect()[0]
    assert (out.n_scored_days, out.mae_milli, out.bias_milli) == (7, 3000.0, 3000.0)


def test_video_shot_detection_wrap_and_truncation(spark):
    """The pan wrap is the planted cut: video i's shot frame is
    9 - i%9 (9 when i%9 = 0) with the exact 8-column luma delta;
    a truncated container keeps its parsed frames and a sub-2-frame
    payload emits no row."""
    from bigclam_apachespark_spark.operators.multimodal import (
        VIDEO_MAGIC,
        synthetic_video_media,
        video_shot_detection,
    )

    media = synthetic_video_media(spark, n=12)
    rows = {r.media_id: r for r in video_shot_detection(media).collect()}
    for i in range(12):
        expect = 9 if i % 9 == 0 else 9 - (i % 9)
        assert rows[i].shot_frame == expect, (i, rows[i])
        assert rows[i].delta == 48960
        assert rows[i].n_frames == 16

    short = spark.createDataFrame(
        [(99, "video", bytearray(VIDEO_MAGIC + bytes([16]) + b"\0" * 192))],
        "media_id long, kind string, payload binary",
    )
    assert video_shot_detection(short).count() == 0


def test_ab_cuped_variance_reduction_and_theta(spark):
    """Planted experiment where post = 2*pre + arm effect: CUPED with
    theta ~= 2 must strip the pre-period spread, so the adjusted
    means replayed in pure Python (same integer moments, same IEEE
    chain) match exactly — and a pre-period with zero variance
    degrades theta to 0 (adjusted = raw)."""
    import hashlib

    from bigclam_apachespark_spark.operators.events import ab_cuped_readout

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    eid = 0
    users = list(range(1, 41))
    for u in users:
        pre = 10 + (u % 7)          # per-user covariate spread
        post = 2 * pre + (5 if h64(str(u)) % 2 else 0)
        rows.append((u, eid, 0 * 86400 + 5, float(pre))); eid += 1
        rows.append((u, eid, 9 * 86400 + 5, float(post))); eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, value double"
    ).selectExpr(
        "user_id", "event_id", "timestamp_seconds(sec) AS ts",
        "value", "'buy' AS event_type"
    )
    got = {r.arm: r for r in ab_cuped_readout(ev).collect()}

    xs = {u: (10 + (u % 7)) * 100 for u in users}
    ys = {u: 2 * xs[u] + (500 if h64(str(u)) % 2 else 0) for u in users}
    n = len(users)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in users)
    sxx = sum(xs[u] * xs[u] for u in users)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for arm, flag in (("control", 0), ("treatment", 1)):
        au = [u for u in users if h64(str(u)) % 2 == flag]
        ax, ay = sum(xs[u] for u in au), sum(ys[u] for u in au)
        mean_adj = (ay / len(au) - theta * (ax / len(au) - sx / n)) * 10.0
        assert got[arm].n_users == len(au)
        assert got[arm].mean_adj_milli == round(mean_adj, 6), arm
    # the adjusted gap approximates the planted 5-unit effect (the
    # pooled theta absorbs a little of the effect, so exact-5000 is
    # NOT the contract — within 5% is)
    gap = got["treatment"].mean_adj_milli - got["control"].mean_adj_milli
    assert abs(gap - 5000.0) < 250.0, gap


def test_ab_power_cuped_reduction_and_degenerate_variance(spark):
    """With post perfectly correlated to pre (y = 2x), rho2 = 1 and
    the CUPED MDE collapses to ~0 while the raw MDE matches the
    hand-computed 2.8*sigma*sqrt(2/(n/2)); a constant covariate
    degrades rho2 to 0 and the two MDEs coincide."""
    import math

    from bigclam_apachespark_spark.operators.events import ab_power_readout

    def build(pre_fn):
        rows = []
        eid = 0
        for u in range(1, 31):
            pre = pre_fn(u)
            rows.append((u, eid, 5, float(pre))); eid += 1
            rows.append((u, eid, 9 * 86400 + 5, float(2 * pre))); eid += 1
        return spark.createDataFrame(
            rows, "user_id long, event_id long, sec long, value double"
        ).selectExpr(
            "user_id", "event_id", "timestamp_seconds(sec) AS ts",
            "value", "'buy' AS event_type"
        )

    out = ab_power_readout(build(lambda u: 10 + (u % 5))).collect()[0]
    assert out.n_users == 30
    assert abs(out.rho2_milli - 1000.0) < 1e-6
    assert out.mde_cuped_milli == 0.0
    ys = [2 * (10 + (u % 5)) * 100 for u in range(1, 31)]
    n = 30
    var_y = (sum(y * y for y in ys) - sum(ys) ** 2 / n) / (n - 1)
    mde = 2.8 * math.sqrt(var_y) * math.sqrt(2 / (n / 2)) * 10.0
    assert abs(out.mde_milli - mde) < 1e-6

    flat = ab_power_readout(build(lambda u: 7)).collect()[0]
    assert flat.rho2_milli == 0.0
    assert flat.mde_milli == flat.mde_cuped_milli


def test_semdedup_keeps_farthest_from_centroid(spark, vecs):
    """SemDeDup dominance hand-check: with ONE cell every vector is a
    cellmate; at eps=0.95 the two planted near-dup pairs (0,1) and
    (2,3) must each collapse to their lower-centroid-cosine member,
    and vector 4 (similar to nothing at 0.95) must survive."""
    from bigclam_apachespark_spark.operators.similarity import semdedup

    out = {r["vec_id"]: r for r in semdedup(vecs, n_cells=1, eps=0.95).collect()}
    assert len(out) == 5
    assert out[4]["kept"]
    # exactly one member of each near-dup pair survives…
    assert out[0]["kept"] != out[1]["kept"]
    assert out[2]["kept"] != out[3]["kept"]
    # …and it is the one with the LOWER cosine to the cell centroid
    for a, b in ((0, 1), (2, 3)):
        kept = a if out[a]["kept"] else b
        dropped = b if out[a]["kept"] else a
        assert out[kept]["cent_cos"] <= out[dropped]["cent_cos"]


def test_semdedup_no_cross_cell_dominance(spark, vecs):
    """With enough cells that the near-dup pairs split from the rest,
    dominance only acts within a cell: everything similar lands
    together and the kept count still drops by exactly 2."""
    from bigclam_apachespark_spark.operators.similarity import semdedup

    out = semdedup(vecs, n_cells=2, eps=0.95).collect()
    kept = sum(1 for r in out if r["kept"])
    assert len(out) == 5 and kept == 3


def test_cms_topk_stream_survives_candidate_eviction_pressure(spark, tmp_path):
    """The ε-heavy-hitter retention claim under REAL eviction
    pressure: 60 distinct keys but only 12 candidate slots, replayed
    in 5 micro-batches. The planted heavy keys (0, 1, 2 — hundreds of
    occurrences vs ≤ 10 for the tail) must survive every per-batch
    candidate cutoff and the final head must equal the one-shot
    full-feed CMS head."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.functions.hashing import hash64
    from bigclam_apachespark_spark.operators.sketches import cms_counters
    from bigclam_apachespark_spark.streaming.cdc_stream import cms_topk_stream

    # key k occurs 300-100k times for k<3, else ~5 times
    heavy = spark.range(900).select((F.col("id") % 3).alias("user_id"))
    tail = spark.range(300).select(((F.col("id") % 57) + 3).alias("user_id"))
    ev = heavy.unionByName(tail)
    src_dir = str(tmp_path / "src")
    ev.repartition(5).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    got = [
        (r.user_id, r.n_cms)
        for r in cms_topk_stream(
            spark, stream, "user_id", str(tmp_path / "state"),
            k=3, candidates=12,
        ).collect()
    ]
    # one-shot twin over the full feed
    toks = ev.select(F.col("user_id").cast("string").alias("term"))
    counters = cms_counters(toks, "term", 4, 1024)
    probes = ev.select("user_id").distinct().select(
        "user_id",
        F.explode(
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
                            % 1024
                        ).cast("int").alias("bucket"),
                    )
                    for r in range(4)
                ]
            )
        ).alias("p"),
    ).select("user_id", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
    est = (
        probes.join(counters, ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("n_cms"))
    )
    exp = [
        (r.user_id, r.n_cms)
        for r in est.orderBy(F.col("n_cms").desc(), "user_id").limit(3).collect()
    ]
    assert got == exp
    assert {u for u, _ in got} == {0, 1, 2}  # the planted heavies
