"""operators/prefix.py — the two-pass distributed prefix/rank/ntile
primitives must agree BIT-FOR-BIT with the single-partition global
windows they replace (which are fine as test oracles at test scale)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_cdc_spark.operators.prefix import (
    lower_bucket_agg,
    ntile_two_pass,
    row_number_two_pass,
    with_range_bucket,
)


def _df(spark, n=257, seed=7):
    # deterministic, tie-heavy values (v repeats every ~13) so the
    # tie-break path is genuinely exercised
    rows = [((i * 2654435761 + seed) % 97, i) for i in range(n)]
    return spark.createDataFrame(rows, "v long, k long")


def test_range_bucket_is_monotone_in_order_col(spark):
    b = with_range_bucket(_df(spark), "v", 8)
    spans = (
        b.groupBy("__bkt")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("__bkt")
        .collect()
    )
    assert len(spans) > 1  # actually spread across buckets
    for prev, cur in zip(spans, spans[1:]):
        assert prev.hi <= cur.lo  # buckets never interleave values


def test_range_bucket_constant_column_single_bucket(spark):
    df = spark.createDataFrame([(5, i) for i in range(10)], "v long, k long")
    got = with_range_bucket(df, "v", 8).select("__bkt").distinct().collect()
    assert [r["__bkt"] for r in got] == [0]


def test_row_number_two_pass_matches_global_window(spark):
    df = _df(spark)
    got = {
        (r.v, r.k): r.rn
        for r in row_number_two_pass(df, "v", ["k"], "rn").collect()
    }
    want = {
        (r.v, r.k): r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_row_number_two_pass_descending(spark):
    df = _df(spark)
    got = {
        (r.v, r.k): r.rn
        for r in row_number_two_pass(
            df, "v", ["k"], "rn", ascending=False
        ).collect()
    }
    want = {
        (r.v, r.k): r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("k")))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_rows", [1, 3, 4, 5, 257])
@pytest.mark.parametrize("tiles", [2, 4, 7])
def test_ntile_two_pass_matches_ntile(spark, n_rows, tiles):
    df = _df(spark, n=n_rows)
    got = {
        (r.v, r.k): r.t
        for r in ntile_two_pass(df, tiles, "v", "k", "t").collect()
    }
    want = {
        (r.v, r.k): r.t
        for r in df.withColumn(
            "t", F.ntile(tiles).over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_range_bucket_balances_skewed_order_column(spark):
    """The round-4 helper interpolated buckets linearly between
    min/max, so a heavily skewed order column (99% of rows in a narrow
    value range, 1% outliers far above) crammed ~99% of rows into
    bucket 0 and the two-pass window re-degenerated toward a single
    task.  Quantile boundaries must spread the mass: no bucket may
    exceed 2x the mean bucket size."""
    n, n_buckets = 1000, 16
    rows = [((i * 2654435761) % 97, i) for i in range(n - 10)]
    rows += [(10**9 + i, n + i) for i in range(10)]  # 1% far outliers
    df = spark.createDataFrame(rows, "v long, k long")
    sizes = [
        r.c
        for r in with_range_bucket(df, "v", n_buckets)
        .groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(sizes) <= 2 * (n / n_buckets), sizes
    # and the mass actually spread: most buckets are populated
    assert len(sizes) >= n_buckets // 2, sizes


def test_range_bucket_keeps_ties_in_one_bucket(spark):
    """Equal order keys MUST share a bucket (tie-break columns only
    order correctly within one window partition) — the invariant that
    makes the quantile sketch's approximation harmless."""
    rows = [(i % 5, i) for i in range(200)]  # 5 values x 40 rows
    df = spark.createDataFrame(rows, "v long, k long")
    per_value = (
        with_range_bucket(df, "v", 8)
        .groupBy("v")
        .agg(F.countDistinct("__bkt").alias("nb"))
        .collect()
    )
    assert all(r.nb == 1 for r in per_value)


def test_lower_bucket_agg_sum_and_max(spark):
    per = spark.createDataFrame(
        [(0, 10), (2, 5), (5, 7)], "b int, x long"
    )
    sums = {
        r.b: r.off
        for r in lower_bucket_agg(per, "b", "x", "off").collect()
    }
    assert sums == {0: 0, 2: 10, 5: 15}
    maxs = {
        r.b: r.m
        for r in lower_bucket_agg(
            per, "b", "x", "m", combine="max", default=None
        ).collect()
    }
    assert maxs == {0: None, 2: 10, 5: 10}


def test_prefix_results_invariant_to_shuffle_partitions(spark):
    """Cluster-size independence: the two-pass rank must not depend on
    the physical partition count (the reason it buckets on VALUES, not
    spark_partition_id)."""
    df = _df(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = sorted(
            (r.v, r.k, r.rn)
            for r in row_number_two_pass(df, "v", ["k"], "rn").collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        many = sorted(
            (r.v, r.k, r.rn)
            for r in row_number_two_pass(df, "v", ["k"], "rn").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert few == many


def test_two_pass_null_ordering_matches_global_window(spark):
    """NULL order values must follow the replaced global window's
    semantics exactly: ASC → nulls first, DESC → nulls last.  Compared
    directly against Window.orderBy(F.asc/F.desc) on a corpus with
    nulls at both extremes and in the middle of the value range."""
    from pyspark.sql import Window

    from lakehouse_cdc_spark.operators.prefix import (
        ntile_two_pass,
        row_number_two_pass,
    )

    rows = [(i, v) for i, v in enumerate(
        [None, 5, 1, None, 9, 3, 7, None, 2, 8, 4, 6]
    )]
    df = spark.createDataFrame(rows, "id int, v int")
    for ascending in (True, False):
        order = F.asc("v") if ascending else F.desc("v")
        expected = {
            (r.id, r.rn, r.nt)
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(order, "id"))
            )
            .withColumn("nt", F.ntile(5).over(Window.orderBy(order, "id")))
            .collect()
        }
        two_pass = row_number_two_pass(
            df, "v", ["id"], "rn", ascending=ascending, n_buckets=4
        )
        two_pass = ntile_two_pass(
            two_pass, 5, "v", "id", "nt", ascending=ascending, n_buckets=4
        )
        got = {(r.id, r.rn, r.nt) for r in two_pass.collect()}
        assert got == expected, f"ascending={ascending}"


def test_lower_bucket_agg_partition_cols_scopes_the_carry(spark):
    """With partition_cols, each key's prefix carry is independent —
    a bucket of key A never leaks into key B's cumulative sum (the
    per-layout sweep maintenance_clustering_depth relies on)."""
    from lakehouse_cdc_spark.operators.prefix import lower_bucket_agg

    rows = [
        ("a", 0, 10), ("a", 1, 20), ("a", 2, 30),
        ("b", 0, 1), ("b", 2, 2),
    ]
    df = spark.createDataFrame(rows, "k string, bkt int, v long")
    got = {
        (r.k, r.bkt, r.carry)
        for r in lower_bucket_agg(
            df, "bkt", "v", "carry", partition_cols=["k"]
        ).collect()
    }
    assert got == {
        ("a", 0, 0), ("a", 1, 10), ("a", 2, 30),
        ("b", 0, 0), ("b", 2, 1),
    }
    # no partition_cols: unchanged legacy behavior (global carry)
    solo = df.filter(F.col("k") == "a")
    legacy = {
        (r.bkt, r.carry)
        for r in lower_bucket_agg(solo, "bkt", "v", "carry").collect()
    }
    assert legacy == {(0, 0), (1, 10), (2, 30)}
