"""Relational warehouse operators over the TPC-H-ish tables:
data-quality validation and the classic scan-agg / join-agg report
shapes (north-star extension; the reference has no relational surface
at all — SURVEY.md §2 "not present").

Exactness design: money sums are computed in INTEGER cents /
basis-points, not floats. A double sum over tens of thousands of
~1e5-magnitude prices carries an aggregation-order-dependent error
far above round(…, 6) — the classic nondeterministic-aggregate trap.
Quantizing each row once (exact: the synthetic prices have ≤2
decimals) makes every SUM an exact integer fold, order-independent
on any engine; the final division back to currency is one
correctly-rounded IEEE op. Width policy: per-ROW arithmetic stays
BIGINT (safe to ~$9e12 per line item — cents·percent² < 2^63), but
the two wide accumulators (disc_price ~2e9/row, charge ~2e11/row)
are SUMmed as DECIMAL(38,0) — Spark's exact 128-bit path — because
a BIGINT fold of charge wraps silently at ~5e7 rows per group
(≈TPC-H sf100, well inside a 100-TB run). DuckDB's BIGINT SUM
already returns HUGEINT, so the oracle side was never at risk;
DECIMAL(38,0) makes the Spark side match exactly at any group size
(``tests/test_text_dedup.py::test_pricing_summary_decimal_headroom``
proves it past 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col: str) -> "F.Column":
    return F.round(F.col(col) * 100).cast("long")


def dq_report(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Data-quality validation report → ``(rule, n_bad)``, one row
    per rule — the expectation-check stage every production pipeline
    runs before trusting a batch. Column rules are conditional sums
    inside ONE scan per table (no per-rule jobs); referential rules
    are left-anti join counts (broadcast when the dimension side is
    small, AQE decides). All integer arithmetic."""
    o_rules = orders.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias(
            "orders_null_custkey"
        ),
        F.sum((F.coalesce(F.col("o_totalprice"), F.lit(-1.0)) <= 0).cast("long")).alias(
            "orders_nonpositive_total"
        ),
    )
    l_rules = lineitem.agg(
        F.sum(
            (
                (F.coalesce(F.col("l_discount"), F.lit(-1.0)) < 0)
                | (F.col("l_discount") > 1)
            ).cast("long")
        ).alias("lineitem_discount_range"),
        F.sum((F.coalesce(F.col("l_quantity"), F.lit(0.0)) <= 0).cast("long")).alias(
            "lineitem_nonpositive_qty"
        ),
    )
    fk_o = orders.join(
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    ).agg(F.count("*").alias("orders_fk_customer"))
    fk_l = lineitem.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    ).agg(F.count("*").alias("lineitem_fk_orders"))

    def melt(df: DataFrame) -> DataFrame:
        cols = df.columns
        pairs = []
        for c in cols:
            pairs.extend([F.lit(c), F.col(c).cast("long")])
        return df.select(
            F.explode(F.create_map(*pairs)).alias("rule", "n_bad")
        )

    return melt(o_rules).unionByName(melt(l_rules)).unionByName(
        melt(fk_o)
    ).unionByName(melt(fk_l))


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-03") -> DataFrame:
    """TPC-H Q1-shape pricing summary per (returnflag, linestatus) —
    THE scan-agg throughput benchmark: one pruned scan, one hash agg
    with map-side combine, whole-stage codegen throughout.

    Decimal-exact: prices/discounts/taxes are quantized once to
    integer cents / percent points (exact — the data carries ≤2
    decimals), so every SUM is an order-independent integer fold and
    the currency results are single divisions — cross-engine
    bit-stable where naive double sums at ~1e9 magnitude would drift
    above the 6-dp comparison. The two wide accumulators
    (disc_price cents·percent ~2e9/row, charge cents·percent²
    ~2e11/row) SUM as DECIMAL(38,0) — Spark's exact 128-bit fold —
    because a BIGINT sum of charge wraps silently at ~5e7 rows per
    group (≈TPC-H sf100); per-row arithmetic stays BIGINT (safe to
    ~$9e12 per line item)."""
    li = lineitem.where(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp"))
    ep = _cents("l_extendedprice")
    qty = _cents("l_quantity")
    disc = F.round(F.col("l_discount") * 100).cast("long")  # percent points
    tax = F.round(F.col("l_tax") * 100).cast("long")
    disc_price = ep * (100 - disc)  # cents·percent
    charge = disc_price * (100 + tax)  # cents·percent²
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("_sq"),
        F.sum(ep).alias("_sbp"),
        F.sum(disc_price.cast("decimal(38,0)")).alias("_sdp"),
        F.sum(charge.cast("decimal(38,0)")).alias("_sch"),
        F.sum(disc).alias("_sd"),
        F.count("*").alias("count_order"),
    )
    n = F.col("count_order").cast("double")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq").cast("double") / 100.0, 6).alias("sum_qty"),
        F.round(F.col("_sbp").cast("double") / 100.0, 6).alias("sum_base_price"),
        F.round(F.col("_sdp").cast("double") / 10000.0, 6).alias("sum_disc_price"),
        F.round(F.col("_sch").cast("double") / 1000000.0, 6).alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / 100.0 / n, 6).alias("avg_qty"),
        F.round(F.col("_sbp").cast("double") / 100.0 / n, 6).alias("avg_price"),
        F.round(F.col("_sd").cast("double") / 100.0 / n, 6).alias("avg_disc"),
        "count_order",
    )


def top_revenue_orders(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    order_before: str = "1995-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shape top-k revenue orders for one market segment —
    the join-agg benchmark: customer filter broadcast into orders,
    the surviving orders semi-joined into lineitem BEFORE the
    revenue agg (the big table never carries dropped rows through
    the shuffle), integer-cents revenue, deterministic top-k
    (revenue desc, orderkey) via TakeOrderedAndProject."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = (
        orders.where(F.col("o_orderdate") < F.lit(order_before).cast("timestamp"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    li = lineitem.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("_rev"))
    agg = per_order.join(
        o, per_order.l_orderkey == o.o_orderkey
    ).select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("_rev").cast("double") / 10000.0, 6).alias("revenue"),
    )
    return agg.orderBy(F.col("revenue").desc(), "o_orderkey").limit(k)

def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shape local-supplier revenue per nation — the
    6-table join-ordering benchmark: for one region and one order
    year, revenue from lineitems whose SUPPLIER sits in the same
    nation as the ordering CUSTOMER.

    Scale shape (what Catalyst should — and does — plan): the
    region⨝nation filter chain collapses to a ≤25-row nation list
    that is explicitly BROADCAST into customer and supplier (the
    only joins small enough to force at any scale); the date filter
    pushes to the orders scan; lineitem — the only 100-TB table —
    is touched once, equi-joined to the filtered orders on orderkey
    and to the region's suppliers on suppkey, with the same-nation
    condition riding the join (cust_nation = supp_nation as a join
    predicate, never a post-join filter over a wider product).
    Those two joins are left to Catalyst/AQE: at small SF both
    sides auto-broadcast; at 100 TB they become key-partitioned
    hash joins — forcing a broadcast there would be the bug.
    Revenue is an exact integer-cents fold per nation.
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nation"))
    o = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("s_nationkey").alias("supp_nation"), "n_name")
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    li = lineitem.join(o, lineitem.l_orderkey == o.o_orderkey).join(
        supp,
        (lineitem.l_suppkey == supp.s_suppkey)
        & (F.col("cust_nation") == F.col("supp_nation")),
    )
    return (
        li.groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"))
        .select(
            "n_name",
            F.round(F.col("_rev").cast("double") / 10000.0, 6).alias("revenue"),
        )
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    market_region: str = "AMERICA",
    supp_nation: str = "NATION_3",
    part_type: str = "PROMO",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8-shape national market share — the conditional-
    aggregation join shape: within one region's customers' orders of
    one part type, the fraction of revenue supplied by one target
    nation, per order year → ``(o_year, nation_revenue,
    total_revenue, mkt_share)``.

    Scale shape: the region⨝nation chain broadcasts into customer
    (market side); the supplier⨝nation lookup broadcasts the ≤25-row
    nation table and keeps ONLY a boolean ``is_target`` (the share
    numerator is a conditional sum inside the SAME hash agg as the
    denominator — one aggregate, not two joined subqueries); the
    part-type filter prunes lineitem via an equi-join that AQE sizes
    (filtered part is |part|/|types| — broadcastable at small SF,
    shuffle-hash at 100 TB; forcing either would be wrong at the
    other scale); the date window pushes to the orders scan.
    lineitem is touched once. Both revenue folds are exact integer
    cents·percent; the share is one double division rounded once.
    """
    nat_r = nation.join(
        F.broadcast(region.where(F.col("r_name") == market_region)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(nat_r), customer.c_nationkey == nat_r.n_nationkey
    ).select("c_custkey")
    o = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(
        "s_suppkey", (F.col("n_name") == supp_nation).alias("is_target")
    )
    pt = part.where(F.col("p_type") == part_type).select("p_partkey")
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    li = (
        lineitem.join(pt, lineitem.l_partkey == pt.p_partkey)
        .join(o, lineitem.l_orderkey == o.o_orderkey)
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
    )
    agg = li.groupBy("o_year").agg(
        F.sum(F.when(F.col("is_target"), rev).otherwise(F.lit(0))).alias("_nat"),
        F.sum(rev).alias("_tot"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("_nat").cast("double") / 10000.0, 6).alias("nation_revenue"),
        F.round(F.col("_tot").cast("double") / 10000.0, 6).alias("total_revenue"),
        F.round(
            F.col("_nat").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("mkt_share"),
    )


def supplier_diversity(
    part: DataFrame,
    lineitem: DataFrame,
    exclude_returnflag: str = "R",
) -> DataFrame:
    """TPC-H Q16-shape supplier diversity — the distinct-aggregate +
    exclusion shape: per (p_brand, p_type), how many DISTINCT
    suppliers shipped that product class, excluding any supplier
    with a returned line item anywhere → ``(p_brand, p_type,
    supplier_cnt)``.

    Scale shape: the exclusion list is one distinct projection
    anti-joined on the supplier key BEFORE the part join (the big
    table drops excluded rows as early as possible); the part
    attribute lookup is an equi-join AQE sizes; COUNT(DISTINCT)
    compiles to Spark's two-phase partial-distinct Expand — a
    map-side dedup on (group, suppkey) then a count, never a
    collect_set blowup. All-integer output."""
    bad = (
        lineitem.where(F.col("l_returnflag") == exclude_returnflag)
        .select("l_suppkey")
        .distinct()
    )
    ps = lineitem.select("l_partkey", "l_suppkey").join(
        bad, "l_suppkey", "left_anti"
    )
    return (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def big_quantity_orders(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    qty_threshold: int = 300,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shape large-volume orders — the agg-then-semi-join
    shape: orders whose total line-item quantity exceeds
    ``qty_threshold``, with their customer, top-``k`` by
    (o_totalprice desc, o_orderkey) → ``(c_name, c_custkey,
    o_orderkey, o_orderdate, o_totalprice, total_qty)``.

    Scale shape: the HAVING filter runs on the lineitem aggregate
    BEFORE any join — the 100-TB table collapses to its qualifying
    order keys first (one map-side-combined hash agg + one integer
    comparison), and only those ~0.3% of orders flow into the
    orders/customer joins, which AQE broadcasts at the resulting
    size. Quantities sum as exact integers; the top-k is a
    TakeOrderedAndProject with a deterministic tie-break, never a
    global sort."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > qty_threshold)
    )
    o = orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty"
    )
    res = o.join(customer, o.o_custkey == customer.c_custkey).select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty",
    )
    return res.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(k)


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#23",
    max_size: int = 10,
) -> DataFrame:
    """TPC-H Q17-shape small-quantity revenue — the correlated-
    average decorrelation shape: yearly-averaged revenue from line
    items of one brand's small parts whose quantity is below 20% of
    that PART's average quantity → one ``(avg_yearly)`` row.

    The correlated subquery (``l_quantity < 0.2 * avg(l_quantity)
    where same part``) decorrelates into a per-part aggregate joined
    back on the part key — the rewrite every engine's optimizer
    must do; here it is expressed directly so the plan is the
    rewritten one by construction. The 20%-of-average comparison is
    exact integer arithmetic (``5·qty·n < Σqty``, no float
    division), so the row set is bit-identical cross-engine.

    Scale shape: the brand/size filter broadcasts a small part-key
    list into lineitem FIRST (semi-join prune — the stats never
    compute over unrelated parts); the per-part stats and the
    stats-back join then shuffle only the surviving slice on the
    same key (one partitioning, reused); the final sum is one
    integer-cents fold."""
    p = part.where(
        (F.col("p_brand") == brand) & (F.col("p_size") < max_size)
    ).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem.l_partkey == p.p_partkey, "left_semi"
    ).select("l_partkey", F.col("l_quantity").cast("long").alias("qty"),
             _cents("l_extendedprice").alias("price_c"))
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n_li")
    )
    small = li.join(stats, "l_partkey").where(
        F.col("qty") * 5 * F.col("n_li") < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum("price_c").cast("double") / 700.0, 6
        ).alias("avg_yearly")
    )


def bucketed_segment_spend(
    spark,
    orders: DataFrame,
    customer: DataFrame,
    table_prefix: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Co-located (bucketed) join — the storage-layout answer to the
    biggest recurring shuffle in a warehouse: both sides are written
    ONCE as bucketed tables on the join key (``bucketBy(n, custkey)``
    + in-bucket sort), and every subsequent join on that key reads
    the matching buckets directly — ZERO Exchange on either side
    (plan-asserted in tests/test_plans.py). Result: per-segment
    order volume → ``(c_mktsegment, n_orders, total_spend)``.

    At 100 TB this is the difference between re-shuffling the fact
    table on every query and paying the partitioning once at ingest:
    fact⨝dim and fact⨝fact joins on the bucket key become map-side
    merges of pre-sorted buckets, and bucket pruning serves point
    lookups. The bucket COUNT is the knob that must hold at scale —
    buckets ≈ data / (executor-digestible split size); both sides
    must agree on it (Spark only elides the shuffle when the bucket
    counts match or divide evenly).

    ``table_prefix`` must be run-unique (caller passes a pid-scoped
    name, same discipline as the persisted IVF index): saveAsTable
    into the session warehouse, mode overwrite."""
    ot, ct = f"{table_prefix}_orders", f"{table_prefix}_customer"
    (
        orders.write.format("parquet").mode("overwrite")
        .bucketBy(n_buckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ot)
    )
    (
        customer.write.format("parquet").mode("overwrite")
        .bucketBy(n_buckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(ct)
    )
    o = spark.table(ot)
    c = spark.table(ct)
    joined = o.join(c, o.o_custkey == c.c_custkey)
    # wide accumulator → DECIMAL(38,0), per the module money policy
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(
            F.sum(_cents("o_totalprice").cast("decimal(38,0)")).cast("double")
            / 100.0,
            6,
        ).alias("total_spend"),
    )


def disjunctive_filter_revenue(
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q19-shape disjunctive-predicate revenue — the
    OR-of-conjunctions shape: revenue from line items matching ANY
    of three (brand, size-range, quantity-range) arms → one
    ``(revenue)`` row. The predicate spans BOTH tables (brand/size
    on part, quantity on lineitem), so a naive plan evaluates it
    only after the join; the scale-correct plan pushes each side's
    weakest common factor down to its scan. Catalyst extracts those
    common factors from the disjunction itself (CNF conversion:
    quantity ≤ 30 reaches the lineitem scan, size ≥ 1 the part
    scan) — asserted in tests/test_plans.py rather than re-derived
    by hand here.

    Scale shape: one part⨝lineitem equi-join (part side prunes to 3
    brands before the join — that filter is disjunction-factorable
    and pushed whole), predicate rides the join, one integer-cents
    fold. Revenue = extendedprice·(1−discount) in exact cents."""
    qty = F.col("l_quantity").cast("long")
    arms = (
        ((F.col("p_brand") == "Brand#12") & qty.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & qty.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#15") & qty.between(20, 30) & F.col("p_size").between(1, 15))
    )
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    j = lineitem.join(
        part.where(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#15")),
        lineitem.l_partkey == part.p_partkey,
    )
    return j.where(arms).agg(
        F.round(F.sum(rev).cast("double") / 10000.0, 6).alias("revenue")
    )


def sole_late_supplier_blame(
    orders: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-intent "sole late supplier" — the double correlated
    quantifier shape (EXISTS another supplier ∧ NOT EXISTS another
    LATE supplier) → ``(s_name, numwait)``, top-``k`` suppliers who
    were the ONLY late supplier on a multi-supplier order. A line
    item is late when it ships more than ``late_days`` after the
    order date (the synthetic schema has no commit/receipt dates;
    ship-vs-order lateness is the same correlation structure).

    The two correlated subqueries decorrelate into ONE aggregation
    cascade instead of two self-joins of the 100-TB table: per
    (order, supplier) fold the late flag, per order count suppliers
    and late suppliers, then blame = late ∧ n_supp>1 ∧ n_late=1.
    Every step is a map-side-combinable hash agg on keys the
    previous step already partitioned by — the orderkey
    partitioning is reused twice; the self-join formulation would
    shuffle lineitem thrice and explode on hot orders.

    Scale shape: one lineitem⨝orders equi-join (date columns only),
    two cascaded hash aggs, a supplier-name broadcast, and a
    TakeOrderedAndProject top-k with deterministic (count desc,
    name) ordering."""
    li = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ).alias("late"),
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("any_late").cast("long")).alias("n_late"),
    )
    blame = (
        per_supp.join(per_order, "l_orderkey")
        .where(F.col("any_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        blame.join(F.broadcast(supplier), blame.l_suppkey == supplier.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def scd2_intervals(
    orders: DataFrame,
    key: str = "o_custkey",
    attr: str = "o_orderpriority",
) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) interval build — the
    warehouse versioning pattern: collapse each key's change-row
    stream into validity intervals → ``(o_custkey, o_orderpriority,
    valid_from, valid_to, n_rows)``, one row per consecutive run of
    an unchanged attribute, ``valid_to`` = the next run's start
    (NULL on the current run). Gaps-and-islands: a lag-change flag,
    a running sum to an island id, a per-island collapse, a lead for
    the closing edge.

    Scale shape: every window partitions by the dimension KEY (the
    natural CDC shard — millions of partitions of a few rows, never
    a global sort); change ordering is (event_time, row_key) so ties
    are deterministic; the island collapse is a hash agg. One
    shuffle on the key, reused by all three steps."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        key, "o_orderkey", "o_orderdate", attr
    ).withColumn(
        "_chg",
        (
            (F.lag(attr).over(w).isNull())
            | (F.lag(attr).over(w) != F.col(attr))
        ).cast("long"),
    ).withColumn("_island", F.sum("_chg").over(w))
    runs = flagged.groupBy(key, "_island").agg(
        # all rows in an island share the attr; min is the
        # deterministic way to say "the" value
        F.min(attr).alias(attr),
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").cast("long").alias("n_rows"),
    )
    w2 = Window.partitionBy(key).orderBy("_island")
    return runs.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_rows",
    )


def upsert_merge(
    snapshot: DataFrame, updates: DataFrame, key: str = "o_orderkey"
) -> DataFrame:
    """MERGE-style upsert (the warehouse CDC-apply step Spark lacks
    without a table format): rows in ``updates`` replace same-key
    snapshot rows, new keys insert, other snapshot rows carry over —
    expressed as updates ∪ (snapshot ⟕anti updates), which is one
    shuffle-free union over an anti join on the key. Deterministic:
    at most one update row per key is assumed (enforce upstream with
    a last-write-wins window when the changefeed can carry dups).

    At scale this is the pattern behind foreachBatch streaming
    upserts: the anti join broadcast-prunes when the update batch is
    small — exactly the common CDC shape (small delta, huge
    snapshot)."""
    return updates.unionByName(snapshot.join(updates.select(key), key, "left_anti"))


def running_totals(orders: DataFrame, customer_key: str = "o_custkey") -> DataFrame:
    """Per-customer running order-value totals → ``(o_custkey,
    o_orderkey, o_orderdate, run_orders, run_total)`` — the ordered-
    window ledger shape. Deterministic ordering (orderdate, orderkey)
    and INTEGER-cents prefix sums, so every running value is an exact
    fold — cross-engine stable at any prefix length, where double
    prefix sums would accumulate order-independent-looking but
    engine-visible rounding drift."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(customer_key)
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = _cents("o_totalprice")
    return orders.select(
        customer_key,
        "o_orderkey",
        "o_orderdate",
        F.count("*").over(w).alias("run_orders"),
        F.round(F.sum(cents).over(w).cast("double") / 100.0, 6).alias("run_total"),
    )


def rolling_order_stats(
    orders: DataFrame, customer_key: str = "o_custkey", frame: int = 3
) -> DataFrame:
    """Per-customer rolling order-value average over the trailing
    ``frame`` orders → ``(o_custkey, o_orderkey, o_orderdate,
    n_in_frame, rolling_avg)`` — the bounded-frame window shape
    (ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW), integer-cents
    exact inside the frame: the sum is a ≤frame-term integer fold,
    the average one IEEE division."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(customer_key)
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-(frame - 1), Window.currentRow)
    )
    cents = _cents("o_totalprice")
    n = F.count("*").over(w)
    return orders.select(
        customer_key,
        "o_orderkey",
        "o_orderdate",
        n.alias("n_in_frame"),
        F.round(
            F.sum(cents).over(w).cast("double") / 100.0 / n.cast("double"), 6
        ).alias("rolling_avg"),
    )


def zorder_key(
    orders: DataFrame,
    bits: int = 16,
) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day) →
    ``(o_orderkey, cust_dim, day_dim, zkey)``: the two dimensions'
    low ``bits`` bits interleaved (cust at even positions, day at
    odd) — the multi-dimensional sort key behind Delta/Iceberg
    OPTIMIZE ZORDER. Sorting a table by zkey before writing makes
    parquet row-group min/max stats selective in BOTH dimensions at
    once, so point/range scans on EITHER column skip files — a
    single-column sort gives locality in one dimension and destroys
    it in the other. The key itself is pure integer bit arithmetic
    (shiftright/&/shiftleft — all inside codegen, zero exchanges to
    compute), so it is bit-identical cross-engine; the layout
    benefit at 100 TB comes from `repartitionByRange(zkey)` +
    in-partition sort at write time (the write path is exercised by
    the partitioned/compacting sink tests; this operator is the
    KEY derivation those writes order by).

    Dimensions clamp into ``bits`` via masking (high bits beyond the
    interleave width cannot influence skipping anyway): cust_dim =
    custkey & (2^bits−1), day_dim = days-since-epoch & (2^bits−1)."""
    mask = (1 << bits) - 1
    cust = F.col("o_custkey").bitwiseAND(F.lit(mask))
    day = (
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .bitwiseAND(F.lit(mask))
    )
    base = orders.select(
        "o_orderkey", cust.alias("cust_dim"), day.alias("day_dim")
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col("cust_dim"), i).bitwiseAND(F.lit(1)),
                    2 * i,
                )
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(F.col("day_dim"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return base.select("o_orderkey", "cust_dim", "day_dim", z.alias("zkey"))


def incremental_agg_merge(
    base_orders: DataFrame,
    delta_orders: DataFrame,
) -> DataFrame:
    """Self-maintainable aggregate update — the materialized-view
    delta pattern: a per-customer (order count, total spend)
    aggregate maintained INCREMENTALLY by aggregating only the delta
    and merging it into the stored base aggregate →
    ``(o_custkey, n_orders, total_spend)``, provably equal to
    recomputing over base ∪ delta (the oracle recomputes; count/sum
    are the self-maintainable class — min/max are not under
    deletes). At 100 TB this is the difference between touching the
    day's partition and re-scanning the table: the merge cost is
    |delta agg| + |base agg|, independent of the fact table's size.
    Both inputs agg to the SAME integer-cents layout, union, and
    re-agg — the merge is one vocabulary-sized hash agg."""
    def per_cust(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(_cents("o_totalprice").cast("decimal(38,0)")).alias("_spend_c"),
        )

    merged = per_cust(base_orders).unionByName(per_cust(delta_orders))
    return merged.groupBy("o_custkey").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.sum("_spend_c").cast("double") / 100.0, 6
        ).alias("total_spend"),
    )


def table_stats(
    lineitem: DataFrame,
    columns: tuple[str, ...] = (
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"
    ),
) -> DataFrame:
    """ANALYZE-style column statistics → one row per column:
    ``(col_name, n_rows, n_nulls, ndv, min_str, max_str)`` — the
    stats a cost-based optimizer (and a human debugging a skewed
    join) needs: exact distinct counts, null counts, and min/max
    (stringified so heterogeneous column types share one schema;
    numeric min/max stringify deterministically on both engines).

    Scale shape: ONE scan feeds every column's stats via a stack of
    per-column aggregates unioned after aggregation (each is a
    map-side-combined hash agg; the union is metadata-sized — never
    an explode of the fact table to (row, col) pairs, which would
    |cols|× the shuffle). Exact NDV is the honest default at this
    fixture size; the HLL sketches (operators/sketches.py) are the
    drop-in for columns where exact distinct would dominate."""
    parts = []
    for c in columns:
        col = F.col(c)
        parts.append(
            lineitem.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.countDistinct(col).cast("long").alias("ndv"),
                F.min(col).cast("string").alias("min_str"),
                F.max(col).cast("string").alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q4-shape order-priority check → ``(o_orderpriority,
    order_count)``: orders placed in a date window that have AT
    LEAST ONE returned line item (the synthetic schema has no
    commit/receipt dates; ``l_returnflag = 'R'`` carries Q4's
    correlated-EXISTS structure unchanged).

    The EXISTS decorrelates into a LEFT SEMI join — Spark never
    materializes the per-order match list, and the date filter is
    pushed to the orders scan so only the window's keys cross the
    wire into the semi-join. One join + one hash agg; the naive
    correlated form would re-scan lineitem per order."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    returned = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def late_priority_matrix(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 60,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12-shape shipping/priority matrix → ``(l_returnflag,
    high_line_count, low_line_count)``: among line items shipped in
    the window MORE than ``late_days`` after their order date, how
    many belong to high-priority (1-URGENT/2-HIGH) vs low-priority
    orders, by return flag (the synthetic schema has no ship mode;
    the return flag plays its grouping role — the CASE-sum-after-
    join shape is Q12's point and is unchanged).

    The ship-window filter is pushed to the lineitem scan; the only
    join carries two narrow columns off orders; both counts fold in
    ONE hash agg (conditional sums, not two passes)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    j = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_status: str = "P"
) -> DataFrame:
    """TPC-H Q13-shape customer order-count distribution →
    ``(c_count, custdist)``: how many customers placed exactly N
    qualifying orders — INCLUDING the zero-order customers the
    inner-join formulation silently drops (the classic Q13 trap).
    Orders with status ``exclude_status`` don't qualify (stand-in
    for Q13's comment NOT LIKE filter — same filtered-left-join
    structure).

    Left join from customer, count the RIGHT side's key (NULL-safe:
    no-match rows count 0), then a second tiny hash agg over the
    ≤|distinct counts| rows. The order-side filter prunes before
    the join; both aggs are map-side combinable."""
    o = orders.where(F.col("o_orderstatus") != exclude_status).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def top_revenue_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q15-shape top supplier → ``(s_suppkey, s_name,
    total_revenue)``: the supplier(s) whose shipped revenue in the
    window equals the GLOBAL maximum — Q15's scalar-subquery-on-a-
    view shape. Revenue folds exactly in integer cents×bps, so the
    max-equality join is an INTEGER comparison: no float-tie
    ambiguity between engines, and genuinely tied suppliers all
    surface (Q15 semantics).

    The per-supplier revenue agg is computed ONCE and reused for
    both sides: the 1-row global max broadcasts back onto it (plan:
    one lineitem scan + one hash agg + a broadcast join), instead
    of the self-join-on-aggregate a literal translation writes.
    Deterministic order by suppkey."""
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        # per-row cast BEFORE the fold: the sum itself runs in
        # decimal(38,0), so the claimed exactness contract holds even
        # where an int64 accumulator would wrap at 100-TB volumes
        .agg(F.sum(rev.cast("decimal(38,0)")).alias("_rev"))
    )
    mx = per_supp.agg(F.max("_rev").alias("_mx"))
    return (
        per_supp.join(F.broadcast(mx), per_supp._rev == mx._mx)
        .join(F.broadcast(supplier), per_supp.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev").cast("double") / 10000.0, 6).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation_keys: tuple = (0, 1, 2, 3, 4, 5, 6),
) -> DataFrame:
    """TPC-H Q22-shape "global sales opportunity" → ``(c_nationkey,
    numcust, totacctbal)``: customers in a nation cohort with an
    account balance above the cohort's positive-balance average who
    have never placed an order (the synthetic schema has no phone
    column; ``c_nationkey`` carries the country-code cohort role).

    The correlated scalar subquery (the global average) is an exact
    INTEGER cross-multiplication: ``bal_cents * n > sum_cents``
    instead of ``bal > sum/n`` — no float division, so the row set
    is bit-identical on any engine and independent of aggregation
    order. The 1-row (sum, n) agg broadcasts onto the customer
    scan; "never ordered" is a LEFT ANTI join (no DISTINCT on the
    100-TB fact side — the anti-join short-circuits per key).
    Balance totals are exact cents, divided back once."""
    cohort = customer.where(
        F.col("c_nationkey").isin(*nation_keys)
    ).select("c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_c"))
    # The FOLD accumulates in decimal too (ADVICE r8): an int64 sum of
    # cent balances overflows (throwing under ANSI) before the decimal
    # cross-multiply below ever sees it — decimal end to end is what
    # makes the comparison overflow-proof rather than ANSI-fail-loud.
    pos = cohort.where(F.col("bal_c") > 0).agg(
        F.sum(F.col("bal_c").cast("decimal(38,0)")).alias("_sum"),
        F.count("*").alias("_n"),
    )
    # decimal cross-multiply: bal_cents (int64) × customer count would
    # approach int64 range at extreme cardinalities
    rich = cohort.join(F.broadcast(pos)).where(
        F.col("bal_c").cast("decimal(38,0)") * F.col("_n") > F.col("_sum")
    )
    idle = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum("bal_c").cast("double") / 100.0, 6
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def order_window_suite(orders: DataFrame) -> DataFrame:
    """Window-function parity sweep → per order within its customer's
    date-ordered history: ``row_number``, ``lag``/``lead`` of the
    total, ``ntile(4)``, ``percent_rank`` and ``cume_dist`` — the
    analytic-function surface a warehouse migration checks off in one
    query. The order key (o_orderdate, o_orderkey) is unique per
    partition, so every function is deterministic; percent_rank and
    cume_dist are single divisions of exact integer ranks (identical
    definitions in Spark and DuckDB).

    Scale shape: ONE exchange on o_custkey feeds every window (all
    six functions share the same partition+sort spec — Spark
    collapses them into a single Window operator over one sort);
    partition sizes are per-customer order counts, naturally
    bounded."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = _cents("o_totalprice")
    back = lambda c: F.round(c.cast("double") / 100.0, 6)  # noqa: E731
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        back(F.lag(cents).over(w)).alias("prev_total"),
        back(F.lead(cents).over(w)).alias("next_total"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def merge_with_deletes(
    snapshot: DataFrame, changes: DataFrame, key: str = "o_orderkey"
) -> DataFrame:
    """Full MERGE semantics (the Delta/Iceberg ``MERGE WHEN MATCHED
    THEN UPDATE / DELETE, WHEN NOT MATCHED THEN INSERT`` contract)
    over plain parquet relations: ``changes`` carries an ``op``
    column — ``'D'`` rows remove their key from the snapshot, every
    other change row replaces-or-inserts (upsert). Expressed as
    (changes minus deletes) ∪ (snapshot ⟕anti ALL change keys):
    one anti join + one union, no shuffle beyond the join.
    Deterministic under the same at-most-one-change-per-key
    contract as ``upsert_merge``; a delete for an absent key is a
    silent no-op (MERGE semantics, both engines agree).

    At 100 TB: identical shape to the CDC apply — the change batch
    is the small side, the anti join broadcast-prunes, and the
    snapshot never reshuffles."""
    upserts = changes.where(F.col("op") != "D").drop("op")
    return upserts.unionByName(
        snapshot.join(changes.select(key), key, "left_anti")
    )


def dq_quarantine(orders: DataFrame) -> DataFrame:
    """Row-level validation bitmask → ``(rule_mask, n_rows,
    min_orderkey, max_orderkey)``: every row is scored against the
    rule set in ONE pass (bit 0: NULL custkey, bit 1: non-positive
    total, bit 2: NULL order date, bit 3: unknown status), and rows
    aggregate by their exact failure COMBINATION — the quarantine
    router's split condition (``rule_mask = 0`` is the clean
    partition) plus the co-occurrence diagnosis ``dq_report``'s
    per-rule totals can't express (it can't tell whether two rules
    fire on the same rows or different ones). All integer; the
    min/max keys give a repair query its probe handles.

    Scale shape: one scan, one map-side-combinable hash agg on a
    ≤2⁴-cardinality key — the cheapest possible full-table audit."""
    mask = (
        F.col("o_custkey").isNull().cast("long")
        + F.shiftleft(
            (F.coalesce(F.col("o_totalprice"), F.lit(-1.0)) <= 0).cast("long"), 1
        )
        + F.shiftleft(F.col("o_orderdate").isNull().cast("long"), 2)
        + F.shiftleft(
            (
                ~F.coalesce(
                    F.col("o_orderstatus").isin("O", "F", "P"), F.lit(False)
                )
            ).cast("long"),
            3,
        )
    )
    return (
        orders.select(mask.alias("rule_mask"), "o_orderkey")
        .groupBy("rule_mask")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("rule_mask")
    )


def conditional_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q6-shape forecast-revenue-change → one row
    ``(revenue)``: Σ extendedprice·discount over a date window,
    a discount band (5–7 percent points, INCLUSIVE integer bounds —
    no float band-edge ambiguity) and a quantity cap. The simplest
    shape in the suite and the purest pushdown test: every
    predicate must reach the scan; the agg is one map-side fold of
    exact cents·pp integers."""
    d = F.round(F.col("l_discount") * 100).cast("long")
    q = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .where((d >= 5) & (d <= 7) & (q < 2400))
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice") * d).cast("double") / 10000.0,
                6,
            ).alias("revenue")
        )
    )


def nation_volume_shipping(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nations: tuple = (1, 2),
) -> DataFrame:
    """TPC-H Q7-shape bilateral trade volume → ``(supp_nation,
    cust_nation, l_year, revenue)``: revenue shipped between two
    nations in BOTH directions, by year — the two-sided cohort
    filter (n1→n2 OR n2→n1) that a naive translation writes as a
    UNION of two 6-way joins; here it is ONE join tree with the
    direction pair as a disjunctive filter, and the nation
    dimension broadcasts twice (customer side, supplier side).
    Exact cents·bps revenue, year from the ship date."""
    a, b = nations
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    j = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .where(
            ((F.col("c_nationkey") == a) & (F.col("s_nationkey") == b))
            | ((F.col("c_nationkey") == b) & (F.col("s_nationkey") == a))
        )
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(F.sum(rev).cast("double") / 10000.0, 6).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q9-shape product-line profit → ``(nation, o_year,
    sum_profit)`` for a part cohort. The synthetic schema has no
    partsupp, so supply cost is ``p_retailprice`` per unit
    (documented substitution — the SHAPE is Q9's: a 5-table join
    whose measure mixes revenue and cost columns from different
    branches, grouped by the supplier's nation and order year).
    profit = ep·(1−disc) − qty·retailprice, folded entirely in the
    shared 10⁻⁴-dollar integer domain (cents·pp for revenue,
    cents·cents/100 ≡ the same scale for cost) — exact, order-free."""
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    cost = (
        F.round(F.col("l_quantity") * 100).cast("long")
        * _cents("p_retailprice")
    )
    j = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_type") == p_type).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "s_nationkey",
        )
    )
    return (
        j.groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum((rev - cost).cast("decimal(38,0)")).cast("double")
                / 10000.0,
                6,
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-07-01",
    date_to: str = "1997-10-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shape returned-item losses → top-k ``(c_custkey,
    c_name, n_name, revenue)``: customers who returned the most
    revenue in a quarter — agg per customer FIRST (the fact side
    collapses before touching the customer dimension), then two
    broadcast dims, then TakeOrdered. Ranking ties break on the
    EXACT integer revenue then custkey, so the top-k frontier is
    engine-independent."""
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    per = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(rev).alias("_rc"))
    )
    return (
        per.join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
                 "c_custkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .orderBy(F.col("_rc").desc(), "c_custkey")
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("_rc").cast("double") / 10000.0, 6).alias("revenue"),
        )
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation_key: int = 5,
    fraction_ppm: int = 1000,
) -> DataFrame:
    """TPC-H Q11-shape important stock → ``(p_partkey, value)``:
    parts whose shipped inventory value through one nation's
    suppliers exceeds ``fraction_ppm``/1 000 000 of that nation's
    total — Q11's scalar-subquery HAVING. The threshold compare is
    an exact integer cross-multiplication (value·10⁶ > total·ppm;
    both fit DECIMAL(38,0) at any scale), so the row set never
    depends on a float. Value = qty·retailprice in the shared
    10⁻⁴-dollar integer domain (no partsupp in the synthetic
    schema; same documented substitution as product_profit).
    Deterministic order: exact value desc, partkey."""
    val = (
        F.round(F.col("l_quantity") * 100).cast("long")
        * _cents("p_retailprice")
    )
    base = (
        lineitem.join(
            F.broadcast(
                supplier.where(F.col("s_nationkey") == nation_key).select(
                    "s_suppkey"
                )
            ),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(part.select("p_partkey", "p_retailprice")),
              lineitem.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(F.sum(val.cast("decimal(38,0)")).alias("_v"))
    )
    total = base.agg(F.sum("_v").alias("_t"))
    return (
        base.crossJoin(F.broadcast(total))
        .where(
            F.col("_v") * F.lit(1000000).cast("decimal(38,0)")
            > F.col("_t") * F.lit(fraction_ppm).cast("decimal(38,0)")
        )
        .orderBy(F.col("_v").desc(), "p_partkey")
        .select(
            "p_partkey",
            F.round(F.col("_v").cast("double") / 10000.0, 6).alias("value"),
        )
    )


def promo_revenue_pct(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1997-06-01",
    date_to: str = "1997-07-01",
) -> DataFrame:
    """TPC-H Q14-shape promotion effect → one row
    ``(promo_revenue_pct)``: the percentage of one month's revenue
    that came from PROMO-type parts. Numerator and denominator fold
    as the SAME exact integer measure (one conditional sum each in
    ONE agg — never two scans), and the percentage is a single
    division."""
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    j = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).join(F.broadcast(part.select("p_partkey", "p_type")),
           lineitem.l_partkey == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    p_size: int = 15,
    region_nations: tuple = (0, 1, 2, 3, 4),
) -> DataFrame:
    """TPC-H Q2-shape min-cost supplier → ``(p_partkey, s_suppkey,
    s_name, n_name, supply_value)``: for each part of a size
    cohort, the region supplier(s) with the MINIMUM total shipped
    value for it (no partsupp table: shipped revenue is the supply-
    cost proxy; the SHAPE — a correlated MIN over a 4-relation dim
    chain, decorrelated into one agg + a min-equality join-back —
    is Q2's, and ties all surface like the reference query's
    multi-row answers). The min-equality compares exact integers."""
    rev = _cents("l_extendedprice") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    sn = supplier.join(
        F.broadcast(
            nation.where(F.col("n_nationkey").isin(*region_nations)).select(
                F.col("n_nationkey").alias("s_nationkey"), "n_name"
            )
        ),
        "s_nationkey",
    ).select("s_suppkey", "s_name", "n_name")
    per = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_size") == p_size).select("p_partkey")
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(sn), lineitem.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.sum(rev.cast("decimal(38,0)")).alias("_v"))
    )
    mn = per.groupBy("p_partkey").agg(F.min("_v").alias("_mn"))
    return (
        per.join(F.broadcast(mn), "p_partkey")
        .where(F.col("_v") == F.col("_mn"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("_v").cast("double") / 10000.0, 6).alias(
                "supply_value"
            ),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def excess_suppliers(
    lineitem: DataFrame, supplier: DataFrame, threshold_pct: int = 50
) -> DataFrame:
    """TPC-H Q20-shape dominant suppliers → ``(s_suppkey, s_name,
    n_parts_dominated)``: suppliers who shipped MORE than
    ``threshold_pct``% of some part's total quantity (Q20's
    excess-inventory intent: availqty > half the shipped volume —
    inverted to the shipped side since the synthetic schema has no
    partsupp). The nested aggregate (per part-supplier vs per
    part) reuses ONE partitioning — the second agg rolls up from
    the first, no second scan — and the threshold is an exact
    integer cross-multiplication (qty_ps·100 > qty_p·pct)."""
    q = F.round(F.col("l_quantity") * 100).cast("long")
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(q).alias("_qps")
    )
    p = ps.groupBy("l_partkey").agg(F.sum("_qps").alias("_qp"))
    dom = (
        ps.join(p, "l_partkey")
        .where(
            F.col("_qps").cast("decimal(38,0)") * 100
            > F.col("_qp").cast("decimal(38,0)") * threshold_pct
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count("*").alias("n_parts_dominated"))
    )
    return (
        dom.join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                 "s_suppkey")
        .orderBy(F.col("n_parts_dominated").desc(), "s_suppkey")
    )


def nullsafe_join_counts(orders: DataFrame) -> DataFrame:
    """Null-safe equality join parity → ``(k, n_rows)``: the fact
    side carries a NULLABLE derived key (custkey % 100, 0 mapped to
    NULL) and joins the distinct key dimension with ``<=>`` — the
    NULL group survives as a real match group, where plain ``=``
    silently drops every NULL-keyed fact row (the classic silent-
    data-loss bug in late-arriving-dimension joins; DuckDB spells
    the operator IS NOT DISTINCT FROM). One of the last D-surface
    semantics a warehouse migration must pin."""
    fact = orders.select(
        F.expr("nullif(o_custkey % 100, 0)").alias("k")
    )
    dim = fact.distinct().select(F.col("k").alias("dk"))
    return (
        fact.join(dim, fact["k"].eqNullSafe(dim["dk"]))
        .groupBy("dk")
        .agg(F.count("*").alias("n_rows"))
        .select(F.col("dk").alias("k"), "n_rows")
        .orderBy(F.col("k").asc_nulls_first())
    )


def fk_profile(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Foreign-key discovery profile → one row per candidate
    (child.col ⊆ parent.col) pair: ``(candidate, n_child_distinct,
    n_matched, inclusion)`` with inclusion = |child ∩ parent| /
    |child| over DISTINCT values — the data-profiling statistic
    schema-discovery tools rank join candidates by (1.0 = a clean
    foreign key; the reverse direction scoring < 1 tells you which
    side is the parent). Candidates profiled both ways for the two
    real FKs plus one deliberate non-key control (custkey vs
    orderkey).

    Scale shape: each column collapses to its distinct set ONCE and
    is reused across candidates (Catalyst re-scans per branch at
    this size; at 100 TB you'd checkpoint the distinct sets —
    they're the profiling working set); intersections are semi-join
    counts on fixed-width keys; inclusion is one exact division."""
    sets = {
        "orders.o_custkey": orders.select(
            F.col("o_custkey").alias("v")
        ).distinct(),
        "customer.c_custkey": customer.select(
            F.col("c_custkey").alias("v")
        ).distinct(),
        "lineitem.l_orderkey": lineitem.select(
            F.col("l_orderkey").alias("v")
        ).distinct(),
        "orders.o_orderkey": orders.select(
            F.col("o_orderkey").alias("v")
        ).distinct(),
    }
    candidates = [
        ("orders.o_custkey", "customer.c_custkey"),
        ("customer.c_custkey", "orders.o_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("orders.o_orderkey", "lineitem.l_orderkey"),
        ("orders.o_custkey", "orders.o_orderkey"),
    ]
    parts = []
    for child, parent in candidates:
        c, p = sets[child], sets[parent]
        stat = c.join(p, "v", "left_semi").agg(
            F.count("*").alias("n_matched")
        ).crossJoin(c.agg(F.count("*").alias("n_child_distinct")))
        parts.append(
            stat.select(
                F.lit(f"{child} -> {parent}").alias("candidate"),
                "n_child_distinct",
                "n_matched",
                F.round(
                    F.col("n_matched").cast("double")
                    / F.col("n_child_distinct").cast("double"),
                    6,
                ).alias("inclusion"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


def incremental_agg_retract(
    base_orders: DataFrame,
    upsert_orders: DataFrame,
    delete_keys: DataFrame,
) -> DataFrame:
    """Retraction-aware materialized-view maintenance → the
    per-customer ``(o_custkey, n_orders, total_spend)`` aggregate
    updated under a delta of UPSERTS (replace by o_orderkey) and
    DELETES — the general dataflow z-set / differential pattern:
    every changed key's OLD row contributes a NEGATIVE (retraction)
    row, every upsert a positive one, and the merge is one
    vocabulary-sized hash agg over base-agg ∪ retractions ∪
    insertions. count/sum are self-maintainable under deletes this
    way (min/max are NOT — they'd need the full group rescanned;
    that asymmetry is the point of the self-maintainable class).

    Customers whose order count reaches zero drop OUT of the view
    (a grouped view has no row for an empty group — the detail
    recompute-vs-merge equivalence hinges on it).

    Scale shape: old-version lookup is ONE join of the fact table
    against the changed-key set (broadcast when the delta is daily-
    sized); everything after runs on aggregate-sized relations —
    the table itself is never rescanned."""
    changed = upsert_orders.select("o_orderkey").unionByName(
        delete_keys.select("o_orderkey")
    ).distinct()
    old = base_orders.join(F.broadcast(changed), "o_orderkey", "left_semi")
    # delete wins over upsert for a key in both (the MERGE
    # WHEN-MATCHED-DELETE precedence): the insertion side drops
    # deleted keys, while their old rows are still retracted above
    upsert_orders = upsert_orders.join(
        F.broadcast(delete_keys.select("o_orderkey")), "o_orderkey", "left_anti"
    )

    def per_cust(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            (F.lit(sign) * F.count("*")).cast("long").alias("n_orders"),
            F.sum(
                F.lit(sign) * _cents("o_totalprice").cast("decimal(38,0)")
            ).alias("_spend_c"),
        )

    merged = (
        per_cust(base_orders, 1)
        .unionByName(per_cust(old, -1))
        .unionByName(per_cust(upsert_orders, 1))
    )
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("_spend_c").alias("_spend_c"),
        )
        .where(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("_spend_c").cast("double") / 100.0, 6).alias(
                "total_spend"
            ),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "o_orderkey",
    compare_cols: tuple[str, ...] = ("o_totalprice", "o_orderstatus"),
) -> DataFrame:
    """Table reconciliation between two snapshots → ``(change_type,
    n_rows)``: ``added`` / ``removed`` / ``changed`` / ``unchanged``
    row counts from ONE full-outer join on the key, plus a
    ``changed:<col>`` row per compared column — the CDC-validation
    report run after every merge window (counts that don't foot
    against the upstream changefeed mean the apply dropped or
    duplicated events). Column comparison is null-safe (``<=>``:
    NULL = NULL is unchanged, NULL vs value is a change — the
    eqNullSafe semantics MERGE itself uses).

    Scale shape: one key-partitioned full-outer join (the same
    shuffle the merge already paid), then a metadata-sized
    conditional aggregate — counts only, no row ever leaves the
    join."""
    o = old.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, "k", "full")
    any_change = None
    for c in compare_cols:
        diff = ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        any_change = diff if any_change is None else (any_change | diff)
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    base = j.agg(
        F.sum(F.when(F.col("_in_old").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("added"),
        F.sum(F.when(F.col("_in_new").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("removed"),
        F.sum(F.when(both & any_change, 1).otherwise(0))
        .cast("long")
        .alias("changed"),
        F.sum(F.when(both & ~any_change, 1).otherwise(0))
        .cast("long")
        .alias("unchanged"),
        *[
            F.sum(
                F.when(
                    both & ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"chg_{c}")
            for c in compare_cols
        ],
    )
    rows = [
        base.select(F.lit(t).alias("change_type"), F.col(t).alias("n_rows"))
        for t in ("added", "removed", "changed", "unchanged")
    ] + [
        base.select(
            F.lit(f"changed:{c}").alias("change_type"),
            F.col(f"chg_{c}").alias("n_rows"),
        )
        for c in compare_cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
