"""Salted-join correctness + vectorized kNN equivalence/speed."""

import time

import pytest
from pyspark.sql import functions as F

from arthur_redshift_etl_spark.operators.similarity import brute_force_knn
from arthur_redshift_etl_spark.operators.skew import detect_skewed_keys, salted_join
from arthur_redshift_etl_spark.operators.vectorized import brute_force_knn_vectorized

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").cast("long").alias("q")
    ).collect()[0]
    salted = salted_join(li, orders, "l_orderkey", salt_factor=4).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").cast("long").alias("q")
    ).collect()[0]
    assert (plain["n"], plain["q"]) == (salted["n"], salted["q"])


def test_detect_skewed_keys(spark):
    df = spark.createDataFrame(
        [(1,)] * 900 + [(2,)] * 50 + [(k,) for k in range(3, 53)], "k long"
    )
    hot = detect_skewed_keys(df, "k", min_share=0.1)
    rows = hot.collect()
    assert [r["k"] for r in rows] == [1]
    assert rows[0]["share"] > 0.8


def test_vectorized_knn_matches_jvm(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    jvm = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_knn(emb, queries, k=5).collect()
    }
    q_local = queries.select("vec_id", "embedding").toPandas()
    vec = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_knn_vectorized(emb, q_local, k=5).collect()
    }
    assert jvm == vec


def test_kmeans_invariants(spark):
    from arthur_redshift_etl_spark.operators.clustering import kmeans
    from arthur_redshift_etl_spark.operators.similarity import as_double_array, dot

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    assignment, centroids = kmeans(emb, k=8, iterations=2)
    counts = assignment.groupBy("centroid_id").count().collect()
    assert sum(r["count"] for r in counts) == n  # partition of the data
    assert assignment.select("vec_id").distinct().count() == n
    assert 1 <= len(counts) <= 8
    assert centroids.count() == len(counts)
    # centroids are 64-dim vectors
    dims = centroids.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]
