"""Direct contract tests for the bucketed two-stage exact-rank
kernels (functions/ranks.py): drop-in equivalence with a plain
unpartitioned ``Window.orderBy`` — including NULL order keys, which
a plain window sorts NULLS FIRST and the kernel must therefore rank
at the very front (bucket 0), not the back."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigclam_apachespark_spark.functions.ranks import (
    bucketed_row_number,
    bucketed_running_sum,
)


def _rows(spark):
    data = [(float(i % 7), i, i % 3 + 1) for i in range(50)]
    data += [(None, 100, 5), (None, 101, 7)]  # NULL order keys
    return spark.createDataFrame(data, "key double, id long, v long")


def test_bucketed_row_number_matches_plain_window(spark):
    df = _rows(spark)
    got = bucketed_row_number(df, ["key", "id"], out="rk", buckets=8)
    w = Window.orderBy("key", "id")
    want = df.withColumn("rk", F.row_number().over(w).cast("long"))
    assert sorted(map(tuple, got.select("id", "rk").collect())) == sorted(
        map(tuple, want.select("id", "rk").collect())
    )
    # NULLS FIRST: the NULL-key rows take ranks 1 and 2
    nulls = {r["rk"] for r in got.where(F.col("key").isNull()).collect()}
    assert nulls == {1, 2}


def test_bucketed_running_sum_matches_plain_window(spark):
    df = _rows(spark)
    got = bucketed_running_sum(df, ["key", "id"], "v", out="rs", buckets=8)
    w = Window.orderBy("key", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("rs", F.sum("v").over(w).cast("long"))
    assert sorted(map(tuple, got.select("id", "rs").collect())) == sorted(
        map(tuple, want.select("id", "rs").collect())
    )


def test_bucketed_row_number_pair_matches_two_rankings(spark):
    """r14: the chained dual ranking must reproduce, row for row, the
    two independent bucketed_row_number calls it replaces (and hence
    the two plain windows) — including rows whose two order keys land
    in different buckets and NULL keys in either ordering."""
    from bigclam_apachespark_spark.functions.ranks import (
        bucketed_row_number_pair,
    )

    data = [(float(i % 7), float((i * 13) % 11), i) for i in range(60)]
    data += [(None, 3.0, 100), (2.0, None, 101)]
    df = spark.createDataFrame(data, "k1 double, k2 double, id long")
    got = bucketed_row_number_pair(
        df, ["k1", "id"], "r1", ["k2", "id"], "r2", buckets=8
    )
    a = bucketed_row_number(df, ["k1", "id"], out="r1", buckets=8).select(
        "id", "r1"
    )
    b = bucketed_row_number(df, ["k2", "id"], out="r2", buckets=8).select(
        "id", "r2"
    )
    want = a.join(b, "id")
    assert sorted(map(tuple, got.select("id", "r1", "r2").collect())) == sorted(
        map(tuple, want.select("id", "r1", "r2").collect())
    )
