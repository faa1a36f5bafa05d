"""Skew utilities: salted plans must be row-identical to the plain
plans they replace (they change physical shape, never results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.skew import (
    salted_count_distinct,
    salted_join,
)


def _skewed(spark):
    # key 1 is hot (300 rows), keys 2..20 have a few rows each
    hot = spark.range(300).select(
        F.lit(1).alias("k"), (F.col("id") % 50).alias("v")
    )
    cold = spark.range(19 * 4).select(
        (F.col("id") % 19 + 2).alias("k"), (F.col("id") % 7).alias("v")
    )
    return hot.union(cold)


def test_salted_join_matches_plain_inner(spark):
    probe = _skewed(spark)
    build = spark.range(25).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in probe.join(build, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(probe, build, "k", n_salts=4).collect()
    )
    assert salted == plain and len(plain) > 0


def test_salted_join_matches_plain_left(spark):
    probe = _skewed(spark)
    # build misses keys > 10 so the left join produces real nulls
    build = spark.range(11).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted(
        (r["k"], r["v"], r["w"])
        for r in probe.join(build, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(probe, build, "k", n_salts=4, how="left").collect()
    )
    assert salted == plain
    assert any(w is None for (_, _, w) in salted)


def test_salted_count_distinct_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, "k", "v", n_salts=4).collect()
    }
    assert salted == plain
    assert plain[1] == 50  # the hot key's true distinct count


def test_salted_count_distinct_skips_nulls(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (1, 5), (2, None)], "k long, v long"
    )
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, "k", "v", n_salts=4).collect()
    }
    # countDistinct never counts NULL; key 2 has nothing but NULLs
    # and must still appear with 0, exactly like the plain aggregate
    assert salted == plain == {1: 1, 2: 0}


def test_spread_small_input_row_identical_and_parallel(spark):
    from bigclam_apachespark_spark.functions.skew import spread_small_input

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("v")
    ).coalesce(1)
    out = spread_small_input(df, min_parts=8)
    assert out.rdd.getNumPartitions() >= 8
    assert sorted((r["doc_id"], r["v"]) for r in out.collect()) == sorted(
        (r["doc_id"], r["v"]) for r in df.collect()
    )


def test_spread_small_input_noop_when_already_partitioned(spark):
    from bigclam_apachespark_spark.functions.skew import spread_small_input

    df = spark.range(100).repartition(16)
    # already at/above the target: the SAME plan object comes back —
    # the at-scale no-op guarantee (scan partitions >= cores).
    assert spread_small_input(df, min_parts=8) is df
