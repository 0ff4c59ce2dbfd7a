#!/usr/bin/env python3
"""Scaling stress for the graph-family catalog entries.

Replicates sf0.1 lineitem K-fold with BOTH l_orderkey and l_partkey
offset per replica, producing K disjoint copies of the co-purchase
graph: edge count and triangle count scale K-fold while the degree
distribution stays constant — the "more data, same distribution" axis.
Offsetting only the orderkey would instead densify the graph (same
parts, K x more co-orders), which changes the support>=2 thinning
regime rather than testing throughput; the disjoint axis isolates the
shuffle scaling of the edge self-join, the wedge join, and the
per-iteration rank aggregates.

Runs the EXACT catalog entries (pagerank_two_iterations,
triangle_count_parts) against each tier so the measured plan is the
shipped plan.  Prints one JSON line per (entry, factor); paste rows
into SCALE.md.

Usage: python scripts/graph_stress.py [--tiers 1,3,10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 100_000_000


def replicate_lineitem(spark, src: str, dst: str, factor: int) -> int:
    base = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    out = (
        base.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__r") * OFFSET)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__r") * OFFSET)
        .drop("__r")
    )
    out.write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))
    return out.count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1,3,10")
    ap.add_argument(
        "--entries", default="pagerank_two_iterations,triangle_count_parts"
    )
    args = ap.parse_args()

    spark = build_session(
        "graph-stress",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    for entry in [e.strip() for e in args.entries.split(",") if e.strip()]:
        for factor in [int(x) for x in args.tiers.split(",") if x]:
            tmp = tempfile.mkdtemp(prefix=f"{entry}_x{factor}_")
            try:
                rows_in = replicate_lineitem(spark, SF_DIR, tmp, factor)
                spark._jvm.System.gc()
                t0 = time.monotonic()
                n = REGISTRY[entry].fn(spark, tmp).count()
                wall = time.monotonic() - t0
                print(
                    json.dumps(
                        {
                            "entry": entry,
                            "factor": factor,
                            "rows_in": rows_in,
                            "rows_out": n,
                            "wall_s": round(wall, 2),
                        }
                    ),
                    flush=True,
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
