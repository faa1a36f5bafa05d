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
