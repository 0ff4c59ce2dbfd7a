"""KLL-style quantile sketch: error bound vs exact ranks, mergeability,
determinism, bounded state."""

from pyspark.sql import functions as F

from arthur_redshift_etl_spark.operators import quantiles as qt

SF = "/root/testdata/sf0.01"


def test_sketch_quantiles_within_rank_error(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    n = li.count()
    sk = qt.kll_partition_sketches(li, "v", capacity=256)
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = qt.kll_quantiles(sk, probs)
    # exact rank of each estimate: |rank(est) - p*n| must be small
    for p, e in zip(probs, est):
        rank = li.filter(F.col("v") <= e).count()
        assert abs(rank - p * n) <= 0.02 * n, (p, e, rank, n)


def test_sketch_state_is_bounded_and_deterministic(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("v")
    ).repartition(8)
    sk1 = qt.kll_partition_sketches(li, "v", capacity=128).collect()
    sk2 = qt.kll_partition_sketches(li, "v", capacity=128).collect()
    # deterministic: same layout -> identical sketch
    assert sorted(map(tuple, sk1)) == sorted(map(tuple, sk2))
    # bounded: well under partitions * capacity * levels
    import math

    n = li.count()
    levels = max(1, int(math.log2(max(2, n // 128))) + 1)
    assert len(sk1) <= 8 * 128 * levels


def test_sketch_merge_is_union(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("v"), F.col("l_orderkey")
    )
    a = qt.kll_partition_sketches(li.filter(F.col("l_orderkey") % 2 == 0), "v")
    b = qt.kll_partition_sketches(li.filter(F.col("l_orderkey") % 2 == 1), "v")
    merged = a.unionAll(b)
    est = qt.kll_quantiles(merged, [0.5])[0]
    n = li.count()
    rank = li.filter(F.col("v") <= est).count()
    assert abs(rank - 0.5 * n) <= 0.02 * n


def test_sketch_handles_nulls_empty_and_rejects_bad_capacity(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "v double"
    )
    sk = qt.kll_partition_sketches(df, "v", capacity=4)
    rows = sk.collect()
    # NaN never enters the sketch; weights conserve the 3 non-null rows
    assert sum(r["weight"] for r in rows) == 3
    assert all(r["value"] == r["value"] for r in rows)  # no NaN
    assert qt.kll_quantiles(sk, [0.5]) == [2.0]

    empty = spark.createDataFrame([], "v double")
    assert qt.kll_quantiles(
        qt.kll_partition_sketches(empty, "v"), [0.5]
    ) == [None]

    for bad in (0, 1, 3, 255):
        with _pytest.raises(ValueError):
            qt.kll_partition_sketches(df, "v", capacity=bad)


def test_ntile_exact_grouped_matches_window_semantics(spark):
    """ntile_exact_grouped == NTILE(k) OVER (PARTITION BY g ORDER BY ...)
    exactly, including groups smaller than k (bucket == rank there) and
    the front-loaded ceil-sized leading buckets."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from arthur_redshift_etl_spark.operators.quantiles import (
        ntile_exact_grouped,
    )

    rows = []
    # group sizes straddling k=4: 1, 2, 3, 4, 5, 9, 103 (ties included)
    for gi, size in enumerate((1, 2, 3, 4, 5, 9, 103)):
        for i in range(size):
            rows.append((f"g{gi}", (i * 7919) % 23, gi * 1000 + i))
    df = spark.createDataFrame(rows, ["g", "v", "id"]).repartition(8)

    got = {
        (r["g"], r["id"]): r["b"]
        for r in ntile_exact_grouped(
            df, 4, ["g"], ["v", "id"], bucket_column="b"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    assert got == want
