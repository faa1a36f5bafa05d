"""As-of / range join unit tests over a hand-built event fixture.

Timeline (one user unless noted), times in seconds from t0:
  u1: click#10 @0, click#11 @0 (same-ts tie), purchase#20 @0 (exact-ts
      match allowed), click#12 @100, purchase#21 @160, purchase#22 @50
  u2: purchase#30 @10 (no clicks at all → NULL match)
  u3: click#40 @500, purchase#41 @100 (click AFTER purchase → NULL)
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigclam_apachespark_spark.operators.temporal import (
    as_of_join,
    click_attribution,
    click_window_stats,
)

T0 = "2024-01-01 00:00:00"


def _events(spark):
    rows = [
        (10, 0, 1, "click", 1.5),
        (11, 0, 1, "click", 2.5),
        (20, 0, 1, "purchase", 9.0),
        (12, 100, 1, "click", 4.0),
        (21, 160, 1, "purchase", 9.0),
        (22, 50, 1, "purchase", 9.0),
        (30, 10, 2, "purchase", 9.0),
        (40, 500, 3, "click", 1.0),
        (41, 100, 3, "purchase", 9.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, off long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        (F.to_timestamp(F.lit(T0)) + F.make_interval(secs=F.col("off"))).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def test_click_attribution_semantics(spark):
    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in click_attribution(_events(spark)).collect()
    }
    assert got[20] == (11, 0)  # exact-ts match; tie → max click_id
    assert got[22] == (11, 50_000_000)  # latest prior is still the @0 pair
    assert got[21] == (12, 60_000_000)  # @100 click wins over @0 pair
    assert got[30] == (None, None)  # user with no clicks
    assert got[41] == (None, None)  # only click is AFTER the purchase
    assert len(got) == 5


def test_as_of_tolerance(spark):
    ev = _events(spark)
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = as_of_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts",
        payload=["click_id"], right_tie="click_id", tolerance_sec=55.0,
    )
    got = {r["purchase_id"]: r["asof_click_id"] for r in j.collect()}
    assert got[22] == 11  # gap 50s ≤ 55s survives
    # merge_asof tolerance semantics: the latest prior click (@100,
    # gap 60s) exceeds the horizon → NO match; no fallback to older rows.
    assert got[21] is None
    assert got[20] == 11  # gap 0
    assert got[30] is None and got[41] is None


def test_click_window_stats_semantics(spark):
    got = {
        r["purchase_id"]: (r["n_clicks"], r["sum_click_value"])
        for r in click_window_stats(_events(spark), window_minutes=1).collect()
    }
    # 1-minute window: purchase@0 sees both @0 clicks; @50 sees them too;
    # @160 sees only the @100 click; u2/u3 purchases see none.
    assert got[20] == (2, 4.0)
    assert got[22] == (2, 4.0)
    assert got[21] == (1, 4.0)
    assert got[30] == (0, 0.0)
    assert got[41] == (0, 0.0)


def test_range_join_bin_boundary(spark):
    """A right row exactly window_sec before the left row sits in the
    previous bin — the bin-1 probe must find it (closed lower bound)."""
    ev = _events(spark)
    purchases = ev.where("event_id = 21").select(  # @160
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    got = {
        r["purchase_id"]: r["n_clicks"]
        for r in click_window_stats(
            ev.where(F.col("event_id").isin(21, 10, 11, 12)), window_minutes=1
        ).collect()
    }
    # window [100, 160]: @100 click qualifies exactly at the bound... and
    # the @0 pair (160s gap) must NOT leak in via the bin-1 probe.
    assert got[21] == 1
    assert purchases.count() == 1


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Randomized equivalence against pandas merge_asof (all three
    directions, by-key, with and without tolerance) over seeded
    datasets. Right timestamps are unique per key so the timestamp
    tie rules coincide, and right/left timestamps live in disjoint
    residue classes mod 3 (rts ≡ 0, lts ≡ 1) so an exact
    nearest-distance tie (rts1 + rts2 = 2·lts → 0 ≡ 2 mod 3) is
    impossible and the nearest comparison is rule-independent; the
    distance-tie rule itself is pinned separately below."""
    import random

    import pandas as pd

    for seed in (1, 2, 3, 4, 5):
        rng = random.Random(seed)
        n_keys = 4
        right_rows, used = [], set()
        for rid in range(60):
            while True:
                k = rng.randrange(n_keys)
                t = rng.randrange(0, 1666) * 3
                if (k, t) not in used:
                    used.add((k, t))
                    break
            right_rows.append((k, t, rid))
        left_rows = [
            (lid, rng.randrange(n_keys), rng.randrange(-34, 1700) * 3 + 1)
            for lid in range(80)
        ]
        tol = rng.choice([None, 250.0, 1000.0])

        ldf = spark.createDataFrame(left_rows, "lid long, k long, lts long").select(
            "lid", "k", F.timestamp_seconds("lts").alias("lts")
        )
        rdf = spark.createDataFrame(right_rows, "k long, rts long, rid long").select(
            "k", F.timestamp_seconds("rts").alias("rts"), "rid"
        )
        lp = pd.DataFrame(left_rows, columns=["lid", "k", "lts"]).sort_values("lts")
        rp = pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values("rts")
        for direction in ("backward", "forward", "nearest"):
            j = as_of_join(
                ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
                payload=["rid"], right_tie="rid", tolerance_sec=tol,
                direction=direction,
            )
            got = {r["lid"]: r["asof_rid"] for r in j.collect()}
            m = pd.merge_asof(
                lp, rp, left_on="lts", right_on="rts", by="k",
                direction=direction,
                tolerance=None if tol is None else int(tol),
            )
            want = {
                int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                for r in m.itertuples()
            }
            assert got == want, f"seed {seed} dir {direction} tol {tol}"


def test_as_of_join_nearest_tie_and_equal_ts(spark):
    """Distance-tie and equal-timestamp rules for direction='nearest',
    pinned against pandas in the same assertions: an exact tie
    (right at t=100 and t=300, left at t=200) resolves BACKWARD, and
    a right row exactly at the left timestamp matches at distance 0;
    forward at equal ts matches too (inclusive >=)."""
    import pandas as pd

    right_rows = [(1, 100, 10), (1, 300, 30), (2, 500, 50)]
    left_rows = [(0, 1, 200), (1, 2, 500), (2, 1, 299)]
    ldf = spark.createDataFrame(left_rows, "lid long, k long, lts long").select(
        "lid", "k", F.timestamp_seconds("lts").alias("lts")
    )
    rdf = spark.createDataFrame(right_rows, "k long, rts long, rid long").select(
        "k", F.timestamp_seconds("rts").alias("rts"), "rid"
    )
    lp = pd.DataFrame(left_rows, columns=["lid", "k", "lts"]).sort_values("lts")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values("rts")
    for direction, expect in (
        ("nearest", {0: 10, 1: 50, 2: 30}),   # tie @200 -> backward 10
        ("forward", {0: 30, 1: 50, 2: 30}),   # equal ts inclusive
        ("backward", {0: 10, 1: 50, 2: 10}),
    ):
        j = as_of_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            payload=["rid"], right_tie="rid", direction=direction,
        )
        got = {r["lid"]: r["asof_rid"] for r in j.collect()}
        assert got == expect, direction
        m = pd.merge_asof(
            lp, rp, left_on="lts", right_on="rts", by="k", direction=direction
        )
        want = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in m.itertuples()
        }
        assert got == want, direction


def test_pit_join_never_leaks_future_dimension(spark):
    """The point-in-time composition (scd2_intervals + backward
    as-of) must give each fact the dimension value valid AT its
    date: an early order must see the EARLY priority even though the
    customer's attribute later changes — the training-data leakage a
    plain dimension join commits."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.relational import scd2_intervals
    from bigclam_apachespark_spark.operators.temporal import as_of_join
    from pyspark.sql import functions as F

    d = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    orders = spark.createDataFrame(
        [
            (1, 7, d("1995-01-01"), "LOW"),
            (2, 7, d("1995-06-01"), "LOW"),
            (3, 7, d("1996-01-01"), "HIGH"),
            (4, 7, d("1996-06-01"), "HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    dim = scd2_intervals(orders).select(
        "o_custkey", "valid_from", F.col("o_orderpriority").alias("prio_pit")
    )
    got = {
        r["o_orderkey"]: r["asof_prio_pit"]
        for r in as_of_join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            dim,
            on=["o_custkey"],
            left_ts="o_orderdate",
            right_ts="valid_from",
            payload=["prio_pit"],
            direction="backward",
        ).collect()
    }
    # orders 1-2 predate the change and must NOT see HIGH
    assert got == {1: "LOW", 2: "LOW", 3: "HIGH", 4: "HIGH"}
