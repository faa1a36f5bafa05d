"""Relational warehouse operators: exactness properties the oracle
gate can't probe — adversarially large money values past BIGINT
headroom."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_pricing_summary_decimal_headroom(spark):
    """The charge accumulator must survive group sums past 2^63: with
    ~$1e12 line items the per-row charge is ~1e18 cents·percent², so
    20 rows overflow a BIGINT fold (~1.8e19 > 9.2e18) — the silent
    wraparound the DECIMAL(38,0) aggregation path exists to prevent.
    Expected values are computed with Python ints (arbitrary
    precision)."""
    from bigclam_apachespark_spark.operators.relational import pricing_summary

    price = 9.07e11  # ≤2 decimals, per-row charge ≈ 9.3e17 (< 2^63)
    n = 20
    rows = [
        (
            "A",
            "F",
            5.0 + i,
            price,
            0.05,
            0.03,
            datetime.datetime(1995, 1, 1 + i % 28),
        )
        for i in range(n)
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    got = pricing_summary(li).collect()
    assert len(got) == 1
    r = got[0]

    ep = round(price * 100)  # exact int cents
    disc_price = ep * (100 - 5)
    charge = disc_price * (100 + 3)
    assert charge * n > 2**63  # the fixture genuinely exceeds BIGINT
    assert r["count_order"] == n
    assert r["sum_base_price"] == round(ep * n / 100.0, 6)
    assert r["sum_disc_price"] == round(disc_price * n / 10000.0, 6)
    assert r["sum_charge"] == round(charge * n / 1000000.0, 6)
    assert r["sum_qty"] == round(sum(5.0 + i for i in range(n)), 6)


def test_pricing_summary_matches_plain_double_at_small_scale(spark):
    """Sanity: on benign magnitudes the integer/decimal path agrees
    with a direct float computation to 6 dp."""
    from bigclam_apachespark_spark.operators.relational import pricing_summary

    rows = [
        ("N", "O", 17.0, 21168.23, 0.04, 0.02, datetime.datetime(1996, 3, 13)),
        ("N", "O", 36.0, 45983.16, 0.09, 0.06, datetime.datetime(1996, 4, 12)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    r = pricing_summary(li).collect()[0]
    exp_disc = sum(p * (1 - d) for _, _, _, p, d, _, _ in rows)
    exp_charge = sum(p * (1 - d) * (1 + t) for _, _, _, p, d, t, _ in rows)
    assert abs(r["sum_disc_price"] - exp_disc) < 1e-4
    assert abs(r["sum_charge"] - exp_charge) < 1e-4
    assert r["count_order"] == 2


def test_scd2_intervals_hand_computed(spark):
    """Gaps-and-islands on a hand-built change stream: runs collapse,
    valid_to chains to the next run's start, the open run is NULL,
    and a REVERTED attribute starts a NEW island (not a merge)."""
    from bigclam_apachespark_spark.operators.relational import scd2_intervals

    d = datetime.datetime
    rows = [
        # cust 1: LOW LOW HIGH LOW  -> 3 islands (LOW reverts)
        (1, 1, d(2020, 1, 1), "LOW"),
        (2, 1, d(2020, 2, 1), "LOW"),
        (3, 1, d(2020, 3, 1), "HIGH"),
        (4, 1, d(2020, 4, 1), "LOW"),
        # cust 2: single row -> one open interval
        (5, 2, d(2021, 1, 1), "MED"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    out = sorted(
        scd2_intervals(orders).collect(),
        key=lambda r: (r["o_custkey"], r["valid_from"]),
    )
    got = [
        (r["o_custkey"], r["o_orderpriority"], r["valid_from"],
         r["valid_to"], r["n_rows"])
        for r in out
    ]
    assert got == [
        (1, "LOW", d(2020, 1, 1), d(2020, 3, 1), 2),
        (1, "HIGH", d(2020, 3, 1), d(2020, 4, 1), 1),
        (1, "LOW", d(2020, 4, 1), None, 1),
        (2, "MED", d(2021, 1, 1), None, 1),
    ]


def test_market_share_hand_computed(spark):
    """Q8 share on a 2-lineitem fixture: one target-nation supplier
    and one other, share = target revenue / total revenue."""
    from bigclam_apachespark_spark.operators.relational import market_share

    d = datetime.datetime
    region = spark.createDataFrame(
        [(0, "AMERICA"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_3", 0), (1, "NATION_9", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.createDataFrame(
        [(10, 0)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame(
        [(100, 0), (101, 1)], "s_suppkey long, s_nationkey int"
    )
    orders = spark.createDataFrame(
        [(1000, 10, d(1996, 6, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    part = spark.createDataFrame(
        [(7, "PROMO"), (8, "SMALL")], "p_partkey long, p_type string"
    )
    lineitem = spark.createDataFrame(
        [
            (1000, 7, 100, 100.0, 0.0),   # target nation: rev 100
            (1000, 7, 101, 300.0, 0.0),   # other nation:  rev 300
            (1000, 8, 100, 999.0, 0.0),   # wrong part type: excluded
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    out = market_share(
        region, nation, customer, supplier, orders, lineitem, part
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["o_year"] == 1996
    assert r["nation_revenue"] == 100.0
    assert r["total_revenue"] == 400.0
    assert r["mkt_share"] == 0.25


def test_supplier_diversity_excludes_returned(spark):
    """Q16 shape: a supplier with ANY returned line item vanishes
    from every group's distinct count."""
    from bigclam_apachespark_spark.operators.relational import (
        supplier_diversity,
    )

    part = spark.createDataFrame(
        [(1, "B1", "PROMO"), (2, "B1", "SMALL")],
        "p_partkey long, p_brand string, p_type string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100, "N"),  # ok supplier
            (1, 101, "N"),  # ok supplier
            (1, 102, "N"),  # 102 also has a return below -> excluded
            (2, 102, "R"),
            (2, 100, "N"),
        ],
        "l_partkey long, l_suppkey long, l_returnflag string",
    )
    out = {
        (r["p_brand"], r["p_type"]): r["supplier_cnt"]
        for r in supplier_diversity(part, lineitem).collect()
    }
    assert out == {("B1", "PROMO"): 2, ("B1", "SMALL"): 1}


def test_big_quantity_orders_having_and_order(spark):
    """Q18 shape: the HAVING threshold binds on the SUMMED quantity
    (no single line need exceed it), and the top-k orders by
    (totalprice desc, orderkey)."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.relational import (
        big_quantity_orders,
    )

    d = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 10, d, 500.0), (2, 10, d, 900.0), (3, 11, d, 900.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(10, "alice"), (11, "bob")], "c_custkey long, c_name string"
    )
    lineitem = spark.createDataFrame(
        # order 1: 6+6 = 12 > 10; order 2: 11 > 10; order 3: 10 (not >)
        [(1, 6.0), (1, 6.0), (2, 11.0), (3, 10.0)],
        "l_orderkey long, l_quantity double",
    )
    got = big_quantity_orders(
        orders, customer, lineitem, qty_threshold=10, k=10
    ).collect()
    # order 3 sums to exactly 10 — NOT > threshold — and must drop;
    # order 2 (price 900) precedes order 1 (price 500).
    assert [(r["o_orderkey"], r["total_qty"], r["c_name"]) for r in got] == [
        (2, 11, "alice"),
        (1, 12, "alice"),
    ]


def test_small_quantity_revenue_integer_threshold(spark):
    """Q17 shape: a line item counts iff 5*qty*n < sum_qty for its
    part (strictly below 20% of the part's average), and the result
    is sum(extendedprice)/7 over exactly those rows."""
    from bigclam_apachespark_spark.operators.relational import (
        small_quantity_revenue,
    )

    part = spark.createDataFrame(
        [(1, "B", 5), (2, "B", 5), (3, "X", 5)],
        "p_partkey long, p_brand string, p_size int",
    )
    # part 1: quantities 1, 9 -> sum 10, n 2; row qty=1: 5*1*2=10 < 10
    # is FALSE (strict) -> nothing qualifies.
    # part 2: quantities 1, 19 -> sum 20, n 2; qty=1: 10 < 20 TRUE.
    # part 3: wrong brand, huge price, must be ignored entirely.
    lineitem = spark.createDataFrame(
        [
            (1, 1.0, 70.0),
            (1, 9.0, 70.0),
            (2, 1.0, 140.0),
            (2, 19.0, 70.0),
            (3, 1.0, 9999.0),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    got = small_quantity_revenue(part, lineitem, brand="B", max_size=10).collect()
    assert len(got) == 1
    assert got[0]["avg_yearly"] == round(140.0 / 7.0, 6)


def test_bucketed_segment_spend_matches_plain_join(spark, tmp_path):
    """The bucketed-layout result must be layout-independent: equal
    to the plain join+agg over the same inputs."""
    import os
    import uuid

    from bigclam_apachespark_spark.operators.relational import (
        bucketed_segment_spend,
    )

    orders = spark.createDataFrame(
        [(i, i % 7, 10.0 + i) for i in range(100)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, "SEG_%d" % (i % 3)) for i in range(7)],
        "c_custkey long, c_mktsegment string",
    )
    prefix = f"bkt_test_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["total_spend"])
        for r in bucketed_segment_spend(
            spark, orders, customer, prefix, n_buckets=4
        ).collect()
    }
    want = {
        r["c_mktsegment"]: (r["n"], round(r["s"], 6))
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("o_totalprice").alias("s"),
        )
        .collect()
    }
    assert got == want
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_orders")
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_customer")


def test_sole_late_supplier_blame_quantifiers(spark):
    """Q21 intent: blame requires (a) the supplier was late, (b) the
    order had ANOTHER supplier, (c) no OTHER supplier was late —
    each violated by one fixture order."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.relational import (
        sole_late_supplier_blame,
    )

    d0 = dt.datetime(1995, 1, 1)
    late = dt.datetime(1995, 6, 1)   # > 90 days after d0
    ontime = dt.datetime(1995, 1, 15)
    orders = spark.createDataFrame(
        [(1, d0), (2, d0), (3, d0)],
        "o_orderkey long, o_orderdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "s10"), (11, "s11"), (12, "s12")],
        "s_suppkey long, s_name string",
    )
    lineitem = spark.createDataFrame(
        [
            # order 1: supp 10 late, supp 11 on time -> 10 blamed
            (1, 10, late), (1, 11, ontime),
            # order 2: both late -> nobody blamed (n_late = 2)
            (2, 10, late), (2, 11, late),
            # order 3: single supplier, late -> not blamed (n_supp = 1)
            (3, 12, late),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    got = [
        (r["s_name"], r["numwait"])
        for r in sole_late_supplier_blame(orders, supplier, lineitem).collect()
    ]
    assert got == [("s10", 1)]


def test_disjunctive_revenue_arm_isolation(spark):
    """Q19 shape: each arm binds its own (brand, size, qty) — a row
    matching one arm's brand but another arm's quantity range must
    NOT count."""
    from bigclam_apachespark_spark.operators.relational import (
        disjunctive_filter_revenue,
    )

    part = spark.createDataFrame(
        [(1, "Brand#12", 3), (2, "Brand#23", 8), (3, "Brand#12", 20)],
        "p_partkey long, p_brand string, p_size int",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.0),    # arm 1: qty 1-11, size 1-5 -> counts
            (1, 15.0, 100.0, 0.0),   # Brand#12 but qty 15 (arm-2 range) -> no
            (2, 15.0, 200.0, 0.5),   # arm 2: qty 10-20, size 1-10 -> counts
            (3, 5.0, 999.0, 0.0),    # Brand#12 size 20 > 5 -> no
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    got = disjunctive_filter_revenue(part, lineitem).collect()
    assert len(got) == 1
    assert got[0]["revenue"] == round(100.0 + 200.0 * 0.5, 6)


def test_zorder_key_interleave_hand_computed(spark):
    """Morton key bit math: cust bits land at even positions, day
    bits at odd — checked against Python's own interleave."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.relational import zorder_key

    def morton(c, d):
        z = 0
        for i in range(16):
            z |= ((c >> i) & 1) << (2 * i)
            z |= ((d >> i) & 1) << (2 * i + 1)
        return z

    epoch = dt.datetime(1970, 1, 1)
    rows = [(k, c, epoch + dt.timedelta(days=d))
            for k, (c, d) in enumerate([(0, 0), (1, 0), (0, 1), (5, 3),
                                        (0xFFFF, 0xFFFF), (70000, 70000)])]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    got = {r["o_orderkey"]: (r["cust_dim"], r["day_dim"], r["zkey"])
           for r in zorder_key(orders, bits=16).collect()}
    assert got[0] == (0, 0, 0)
    assert got[1] == (1, 0, 1)          # cust bit 0 -> position 0
    assert got[2] == (0, 1, 2)          # day bit 0 -> position 1
    assert got[3] == (5, 3, morton(5, 3))
    assert got[4] == (0xFFFF, 0xFFFF, morton(0xFFFF, 0xFFFF))
    # dims beyond 16 bits clamp by masking
    assert got[5] == (70000 & 0xFFFF, 70000 & 0xFFFF,
                      morton(70000 & 0xFFFF, 70000 & 0xFFFF))


def test_table_stats_counts_nulls_and_ndv(spark):
    """ANALYZE stats: null rows count into n_rows but not ndv/min/max."""
    from bigclam_apachespark_spark.operators.relational import table_stats

    li = spark.createDataFrame(
        [(1, 1, 1, 5.0, "N"), (2, 1, None, 7.0, "R"), (3, 2, 9, None, "N")],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_returnflag string",
    )
    s = {r["col_name"]: r for r in table_stats(li).collect()}
    assert s["l_suppkey"]["n_rows"] == 3
    assert s["l_suppkey"]["n_nulls"] == 1
    assert s["l_suppkey"]["ndv"] == 2
    assert s["l_suppkey"]["min_str"] == "1" and s["l_suppkey"]["max_str"] == "9"
    assert s["l_quantity"]["n_nulls"] == 1
    assert s["l_returnflag"]["ndv"] == 2


def test_order_priority_counts_each_order_once(spark):
    """Q4's EXISTS must count an order ONCE no matter how many
    returned line items it has — the inner-join formulation would
    multiply. Order 1: three 'R' lines → 1. Order 2: zero 'R' lines
    → dropped. Order 3: outside the date window → dropped."""
    from bigclam_apachespark_spark.operators.relational import order_priority_check

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", datetime.datetime(1997, 6, 1)),
            (2, "1-URGENT", datetime.datetime(1997, 6, 1)),
            (3, "1-URGENT", datetime.datetime(1996, 6, 1)),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(1, "R"), (1, "R"), (1, "R"), (2, "N"), (3, "R")],
        "l_orderkey long, l_returnflag string",
    )
    got = order_priority_check(orders, li).collect()
    assert [(r.o_orderpriority, r.order_count) for r in got] == [("1-URGENT", 1)]


def test_late_priority_strict_interval_boundary(spark):
    """A line shipped EXACTLY late_days after the order date is not
    late (strict >); one day later is. High/low classes are split by
    priority in one agg."""
    from bigclam_apachespark_spark.operators.relational import late_priority_matrix

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", datetime.datetime(1997, 1, 1)),
            (2, "5-LOW", datetime.datetime(1997, 1, 1)),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, "A", datetime.datetime(1997, 3, 2)),   # exactly +60d: not late
            (1, "A", datetime.datetime(1997, 3, 3)),   # +61d: late, high
            (2, "A", datetime.datetime(1997, 12, 1)),  # late, low
        ],
        "l_orderkey long, l_returnflag string, l_shipdate timestamp",
    )
    got = late_priority_matrix(orders, li, late_days=60).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.l_returnflag, r.high_line_count, r.low_line_count) == ("A", 1, 1)


def test_order_distribution_keeps_zero_order_customers(spark):
    """The Q13 trap: customers with NO qualifying orders must appear
    in the c_count=0 bin — both the never-ordered customer and the
    one whose only order has the excluded status."""
    from bigclam_apachespark_spark.operators.relational import (
        customer_order_distribution,
    )

    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1, "O"), (11, 1, "F"), (12, 2, "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    )
    got = customer_order_distribution(customer, orders).collect()
    # cust 1 → 2 orders; cust 2 → only a 'P' order → 0; cust 3 → 0.
    assert [(r.c_count, r.custdist) for r in got] == [(0, 2), (2, 1)]


def test_top_supplier_surfaces_exact_ties(spark):
    """Q15 semantics: every supplier at the global max revenue
    surfaces. Revenue folds in integer cents×bps, so two suppliers
    with identical line economics tie EXACTLY."""
    from bigclam_apachespark_spark.operators.relational import top_revenue_supplier

    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")],
        "s_suppkey long, s_name string",
    )
    d = datetime.datetime(1997, 6, 1)
    li = spark.createDataFrame(
        [
            (1, 100.10, 0.05, d),
            (2, 100.10, 0.05, d),  # identical → exact tie with s1
            (3, 50.00, 0.00, d),
            (3, 45.00, 0.00, d),   # 95 < 95.095: below max
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    got = top_revenue_supplier(supplier, li).collect()
    assert [(r.s_suppkey, r.s_name) for r in got] == [(1, "s1"), (2, "s2")]
    assert all(r.total_revenue == round(100.10 * 0.95, 6) for r in got)


def test_idle_rich_strict_mean_and_anti_join(spark):
    """Q22 semantics: the mean is over POSITIVE balances only, the
    comparison is strictly above it (bal*n > sum — exact integers,
    so a balance exactly AT the mean is excluded), and any customer
    with an order is excluded however rich."""
    from bigclam_apachespark_spark.operators.relational import idle_rich_customers

    customer = spark.createDataFrame(
        [
            (1, 0, 300.0),   # above mean(200), no orders → kept
            (2, 0, 200.0),   # exactly at mean → excluded (strict)
            (3, 0, 100.0),   # below mean → excluded
            (4, 0, 500.0),   # above mean but HAS an order → excluded
            (5, 1, -50.0),   # negative: not in the positive mean
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame([(90, 4)], "o_orderkey long, o_custkey long")
    # positive mean = (300+200+100+500)/4 = 275; above it: 300, 500;
    # 500 has an order → kept = {cust 1}.
    got = idle_rich_customers(customer, orders, nation_keys=(0, 1)).collect()
    assert [(r.c_nationkey, r.numcust, r.totacctbal) for r in got] == [(0, 1, 300.0)]


def test_order_window_suite_hand_computed(spark):
    """5 orders for one customer: ntile(4) splits 2/1/1/1, lag/lead
    shift along the date order, percent_rank = (rank-1)/4 in exact
    quarters, cume_dist = rn/5 in exact fifths."""
    from bigclam_apachespark_spark.operators.relational import order_window_suite

    d = datetime.datetime
    rows = [
        (i, 7, "O", 100.0 + i, d(1997, 1, i + 1), "1-URGENT") for i in range(5)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = sorted(order_window_suite(orders).collect(), key=lambda r: r.rn)
    assert [r.rn for r in got] == [1, 2, 3, 4, 5]
    assert [r.quartile for r in got] == [1, 1, 2, 3, 4]
    assert got[0].prev_total is None and got[0].next_total == 101.0
    assert got[4].prev_total == 103.0 and got[4].next_total is None
    assert [r.pct_rank for r in got] == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert [r.cume for r in got] == [0.2, 0.4, 0.6, 0.8, 1.0]


def test_merge_with_deletes_semantics(spark):
    """Update replaces, insert adds, delete removes, absent-key
    delete is a silent no-op, untouched rows carry over."""
    from bigclam_apachespark_spark.operators.relational import merge_with_deletes

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "o_orderkey long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", "U"),    # update
            (4, "d", "I"),    # insert
            (3, None, "D"),   # delete
            (99, None, "D"),  # delete of absent key: no-op
        ],
        "o_orderkey long, v string, op string",
    )
    got = sorted(
        (r.o_orderkey, r.v) for r in merge_with_deletes(snap, changes).collect()
    )
    assert got == [(1, "a"), (2, "B"), (4, "d")]


def test_dq_quarantine_bitmask_combinations(spark):
    """Rows aggregate by their exact failure COMBINATION: a row
    failing custkey (bit 0) AND total (bit 1) lands in mask 3, not
    in two per-rule tallies; NULL status counts as unknown (bit 3);
    a clean row lands in mask 0."""
    import datetime as dt

    from bigclam_apachespark_spark.operators.relational import dq_quarantine

    d = dt.datetime(1996, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, d, "x"),          # clean -> 0
            (2, None, "O", -1.0, d, "x"),       # bits 0+1 -> 3
            (3, 10, "Z", 5.0, None, "x"),       # bits 2+3 -> 12
            (4, 10, None, 5.0, d, "x"),         # bit 3 -> 8
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {r.rule_mask: r.n_rows for r in dq_quarantine(orders).collect()}
    assert got == {0: 1, 3: 1, 12: 1, 8: 1}


def test_important_stock_integer_threshold(spark):
    """The value·10⁶ > total·ppm comparison is strict and exact: a
    part at EXACTLY the threshold fraction is excluded. Total value
    1000 (in 1e-4 dollars), ppm=100000 (10%) → part at value 100 is
    exactly 10%: out; 101: in."""
    from bigclam_apachespark_spark.operators.relational import important_stock

    li = spark.createDataFrame(
        [
            (1, 100, 1.0),   # part 1: qty 1.0
            (2, 100, 1.01),  # part 2: qty 1.01
            (3, 100, 7.99),  # part 3: bulk
        ],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    supplier = spark.createDataFrame([(100, 5)], "s_suppkey long, s_nationkey int")
    part = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "p_partkey long, p_retailprice double"
    )
    # values: 100, 101, 799 (x100 cents x100 qty-cents /1e4); total 1000
    got = {r.p_partkey for r in
           important_stock(li, supplier, part, nation_key=5,
                           fraction_ppm=100000).collect()}
    assert got == {2, 3}


def test_excess_suppliers_dominance(spark):
    """Strictly-more-than-half: a 50/50 split part dominates nobody;
    a 60/40 part credits only the 60% supplier."""
    from bigclam_apachespark_spark.operators.relational import excess_suppliers

    li = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 11, 5.0),    # part 1: tie, no dominator
            (2, 10, 6.0), (2, 11, 4.0),    # part 2: 10 dominates
            (3, 11, 9.0), (3, 10, 1.0),    # part 3: 11 dominates
        ],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    supplier = spark.createDataFrame(
        [(10, "s10"), (11, "s11")], "s_suppkey long, s_name string"
    )
    got = {(r.s_suppkey, r.n_parts_dominated)
           for r in excess_suppliers(li, supplier).collect()}
    assert got == {(10, 1), (11, 1)}


def test_incremental_agg_retract_hand_computed(spark):
    """4 orders across 2 customers: upsert replaces one order's
    price, delete removes another (including a key in BOTH delta
    sides, where delete must win), and a customer whose only order
    is deleted must drop out of the view entirely."""
    from pyspark.sql import functions as F

    from bigclam_apachespark_spark.operators.relational import (
        incremental_agg_retract,
    )

    base = spark.createDataFrame(
        [
            (1, 10, 100.0),
            (2, 10, 50.0),
            (3, 20, 70.0),
            (4, 30, 40.0),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    ups = spark.createDataFrame(
        [(2, 10, 500.0), (4, 30, 99.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    dels = spark.createDataFrame([(3,), (4,)], "o_orderkey long")

    got = {
        r.o_custkey: (r.n_orders, r.total_spend)
        for r in incremental_agg_retract(base, ups, dels).collect()
    }
    # cust 10: order 1 (100) + order 2 upserted (500); cust 20's only
    # order deleted -> absent; cust 30's order both upserted and
    # deleted -> delete wins -> absent
    assert got == {10: (2, 600.0)}


def test_snapshot_diff_hand_computed_with_nulls(spark):
    """4-key diff covering every class: key 1 unchanged, key 2
    changed (price), key 3 removed, key 4 added, key 5 NULL-to-NULL
    unchanged (eqNullSafe), key 6 NULL-to-value changed."""
    from bigclam_apachespark_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, 20.0, "O"),
            (3, 30.0, "F"),
            (5, None, "O"),
            (6, None, "O"),
        ],
        "o_orderkey long, o_totalprice double, o_orderstatus string",
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, 25.0, "O"),
            (4, 40.0, "O"),
            (5, None, "O"),
            (6, 60.0, "O"),
        ],
        "o_orderkey long, o_totalprice double, o_orderstatus string",
    )
    got = {r.change_type: r.n_rows for r in snapshot_diff(old, new).collect()}
    assert got == {
        "added": 1,
        "removed": 1,
        "changed": 2,
        "unchanged": 2,
        "changed:o_totalprice": 2,
        "changed:o_orderstatus": 0,
    }
