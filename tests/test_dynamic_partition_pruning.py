"""Dynamic partition pruning, proven end-to-end.

At 100 TB the single biggest scan saver on a date-partitioned fact is DPP:
a selective filter on the DIM side of a join becomes, at runtime, a
partition filter on the FACT scan — partitions whose join key can't match
are never read.  The engine's `partition_by` write path (loader.py) makes
every published fact eligible; this test pins that the mechanism actually
engages on our session config and MEASURES the pruning from the executed
scan's own metrics, not just the plan text.

Found while building this pin: with the session's default
`reuseBroadcastOnly` DPP, a dim built via ``createDataFrame`` (LocalRelation)
gets the ``dynamicpruningexpression`` PLANNED into the scan but never
pruned at runtime — 12/12 partitions read.  The dim must come from a
relation whose broadcast exchange is reusable (here: parquet).  Plan text
alone would have graded that configuration as working; the metrics test is
the one that catches it.

Layout: lineitem written partitioned by ship month (12 partitions); dim =
(month, quarter) parquet; query filters quarter = 1 through the join.
"""

import pytest
from pyspark.sql import functions as F

from arthur_redshift_etl_spark.plans.metrics import executed_metrics, scan_summary
from arthur_redshift_etl_spark.workload import t

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def dpp_layout(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dpp"))
    li = t(spark, SF, "lineitem").withColumn("ship_month", F.month("l_shipdate"))
    li.write.mode("overwrite").partitionBy("ship_month").parquet(f"{base}/li")
    months = spark.createDataFrame(
        [(m, (m - 1) // 3 + 1) for m in range(1, 13)], "month int, quarter int"
    )
    months.write.mode("overwrite").parquet(f"{base}/months")
    return base


def _q1_join(spark, base):
    fact = spark.read.parquet(f"{base}/li")
    dim = spark.read.parquet(f"{base}/months").filter(F.col("quarter") == 1)
    return fact.join(dim, fact.ship_month == dim.month).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )


def test_dpp_subquery_in_scan_plan(spark, dpp_layout):
    df = _q1_join(spark, dpp_layout)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]


def test_dpp_prunes_partitions_at_runtime(spark, dpp_layout):
    """Executed-scan truth: the quarter-1 join reads 3/12 of the fact's
    partitions, and the row count proves it (not just file bookkeeping)."""
    full = spark.read.parquet(f"{dpp_layout}/li").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    full.collect()
    base_rows = scan_summary(full)["rows_scanned"]

    df = _q1_join(spark, dpp_layout)
    result = df.collect()[0]["q"]
    parts = {
        v
        for op, m, v in executed_metrics(df)
        if op.startswith("Scan") and m == "numPartitions"
    }
    pruned_rows = scan_summary(df)["rows_scanned"]
    assert 3 in parts, f"expected a 3-partition fact scan, metrics: {parts}"
    # 3 of 12 months ± seasonality; the dim's handful of rows ride along
    assert pruned_rows <= 0.4 * base_rows, (pruned_rows, base_rows)

    # and the answer equals the explicit-predicate equivalent
    explicit = (
        spark.read.parquet(f"{dpp_layout}/li")
        .filter(F.col("ship_month").isin(1, 2, 3))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .collect()[0]["q"]
    )
    assert result == explicit


def test_dpp_inert_with_local_relation_dim(spark, dpp_layout):
    """The negative space, pinned so a refactor can't silently regress a
    catalog query into it: a LocalRelation dim plans the pruning expression
    but never prunes — all 12 partitions read."""
    fact = spark.read.parquet(f"{dpp_layout}/li")
    months = spark.createDataFrame(
        [(m, (m - 1) // 3 + 1) for m in range(1, 13)], "month int, quarter int"
    )
    dim = months.filter(F.col("quarter") == 1)
    df = fact.join(dim, fact.ship_month == dim.month).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    df.collect()
    parts = {
        v
        for op, m, v in executed_metrics(df)
        if op.startswith("Scan") and m == "numPartitions"
    }
    assert parts == {12}, parts
