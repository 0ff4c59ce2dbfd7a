#!/usr/bin/env python3
"""Measured skew A/B: AQE skew-split vs salting vs nothing, same answers.

Backs SCALE.md's two claims with numbers instead of assertions:
  1. JOIN skew: AQE's runtime skew-join split handles a hot key in a
     sort-merge join — no manual salting needed (salting still matches it,
     costing a dim explode).
  2. AGGREGATION skew: AQE does NOT split aggregation shuffles.  A hot key
     in an exact count-distinct lands on one task; the two-phase rewrite
     (groupBy(key, value) then groupBy(key)) spreads it by the value hash.

Setup: lineitem at $SPARK_GRAFT_SF_DIR with HOT_FRAC of rows remapped to
one orderkey (mid-range, same trick as graph_stress: the planted key must
not be an edge case of the distribution).  Broadcast is disabled so the
join actually sort-merges; the AQE skew thresholds are lowered to make a
~100 MB-scale demo behave like the 100 TB defaults (256 MB per-partition
threshold) would at production scale.

Run ALONE (32-core contention trap):  python scripts/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_FRAC = float(os.environ.get("SPARK_GRAFT_SKEW_HOT_FRAC", "0.4"))
FACT_COPIES = int(os.environ.get("SPARK_GRAFT_SKEW_COPIES", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from arthur_redshift_etl_spark.operators.skew import salted_join
    from arthur_redshift_etl_spark.session import build_session

    spark = build_session(
        app_name="skew-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            # force the sort-merge path: a broadcast would dodge the skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # scale the 100TB-default skew thresholds (256MB) down to the
            # demo's data volume so the split logic actually engages
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    if FACT_COPIES > 1:
        li = li.unionAll(li)
        for _ in range(FACT_COPIES - 2):
            li = li.unionAll(
                spark.read.parquet(f"{SRC}/lineitem.parquet").select(
                    "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
                )
            )
    orders = spark.read.parquet(f"{SRC}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # plant the hot key: HOT_FRAC of fact rows point at one mid-range order
    hot = orders.approxQuantile("o_orderkey", [0.5], 0.001)[0]
    fact = li.withColumn(
        "o_orderkey",
        F.when(F.rand(seed=7) < HOT_FRAC, F.lit(int(hot))).otherwise(
            F.col("l_orderkey")
        ),
    ).drop("l_orderkey")
    fact = fact.localCheckpoint()  # freeze the randomness; drop read lineage
    n_fact = fact.count()
    print(f"# fact rows: {n_fact:,}  hot key: {int(hot)} (~{HOT_FRAC:.0%})",
          file=sys.stderr)

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        w = time.perf_counter() - t0
        print(f"# {label:34s} {w:7.2f}s  -> {out}", file=sys.stderr)
        return w, out

    def join_checksum(joined):
        row = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        ).collect()[0]
        return (row["n"], row["q"])

    # warm the page cache / first-touch of orders so run order does not
    # bias the first measured variant
    orders.count()
    fact.join(orders, "o_orderkey").select("l_quantity").count()

    results = {"fact_rows": n_fact, "hot_frac": HOT_FRAC}

    # --- 1. JOIN skew -----------------------------------------------------
    def plain_join():
        return join_checksum(
            fact.join(orders, "o_orderkey").select("l_quantity")
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["join_noaqe"], chk0 = timed("SMJ, AQE skew split OFF", plain_join)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["join_aqe"], chk1 = timed("SMJ, AQE skew split ON", plain_join)

    def salted():
        return join_checksum(
            salted_join(fact, orders, "o_orderkey", salt_factor=16).select(
                "l_quantity"
            )
        )

    results["join_salted"], chk2 = timed("salted join (factor 16)", salted)
    assert chk0 == chk1 == chk2, (chk0, chk1, chk2)
    results["join_checksum"] = list(chk0)

    # --- 2. AGGREGATION skew ----------------------------------------------
    # exact distinct parts per order: non-combinable, the hot key's rows
    # all hash to one task in the naive plan
    def naive_distinct():
        df = fact.groupBy("o_orderkey").agg(
            F.countDistinct("l_extendedprice").alias("d")
        )
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("d").alias("s")
        ).collect()[0]
        return (row["n"], row["s"])

    def two_phase_distinct():
        # phase 1 dedupes on (key, value): the hot key spreads across
        # partitions by the VALUE hash; phase 2 counts per key
        df = (
            fact.select("o_orderkey", "l_extendedprice")
            .groupBy("o_orderkey", "l_extendedprice")
            .agg(F.lit(1))
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("d").alias("s")
        ).collect()[0]
        return (row["n"], row["s"])

    results["agg_naive"], a0 = timed("countDistinct per key (naive)", naive_distinct)
    results["agg_two_phase"], a1 = timed("two-phase (key,value) distinct", two_phase_distinct)
    assert a0 == a1, (a0, a1)
    results["agg_checksum"] = list(a0)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
