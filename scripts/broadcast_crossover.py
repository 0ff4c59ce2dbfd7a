#!/usr/bin/env python3
"""Broadcast-vs-shuffle join crossover: where does broadcasting stop winning?

The engine broadcasts small sides everywhere (dim joins, pagerank node
tables under PAGERANK_NODE_BCAST_LIMIT_BYTES=20 MiB, similarity query
sets) and falls back to shuffle joins above a size budget.  The budget's
empirical basis was a single pagerank A/B; this harness measures the
whole curve on one join shape.

Shape: sf1.0-tier lineitem (~6M rows) INNER JOIN a dim of D rows on the
order key, then a group-by agg (so the join's output is consumed, not
collected).  The dim is a deterministic sample of orders.  Per D, warm
min-of-3 under three strategies:

  broadcast — F.broadcast(dim) hint (plan pins BroadcastHashJoin);
  shuffle   — autoBroadcastJoinThreshold=-1, no hint (SortMergeJoin or
              AQE's shuffled-hash; the plan is recorded);
  auto      — engine defaults (AQE decides; records WHICH it picked).

Caveat for reading the numbers: local[32] broadcasts over loopback —
no cross-node transfer — so broadcast cost here is a LOWER bound and the
true 100 TB crossover sits at a SMALLER dim than measured.  The driver-
side build cost (collect + hashmap) is real in both.  Use the curve as
"broadcast wins by >=X below size S even with free transfer"; the
shuffle-side cost (both sides exchanged on the key) scales with the FACT
size, which is why the win grows with fact:dim ratio.

Run ALONE (32-core contention trap):  python scripts/broadcast_crossover.py
Env: SPARK_GRAFT_XOVER_SRC (default /tmp/spark_graft_sf1, falls back to
     $SPARK_GRAFT_SF_DIR), SPARK_GRAFT_XOVER_DIMS (default
     "10000,50000,200000,800000,1500000")
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/tmp/spark_graft_sf1"
SRC = os.environ.get(
    "SPARK_GRAFT_XOVER_SRC",
    SF1 if os.path.isdir(SF1) else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
)
DIMS = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_XOVER_DIMS", "10000,50000,200000,750000,1500000"
    ).split(",")
]
REPS = 3


def run_join(spark, fact, dim, hint: str) -> tuple:
    from pyspark.sql import functions as F

    d = F.broadcast(dim) if hint == "broadcast" else dim
    df = (
        fact.join(d, fact.l_orderkey == d.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    t0 = time.perf_counter()
    df.collect()
    wall = time.perf_counter() - t0
    physical = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" in physical:
        picked = "broadcast_hash"
    elif "ShuffledHashJoin" in physical:
        picked = "shuffled_hash"
    elif "SortMergeJoin" in physical:
        picked = "sort_merge"
    else:
        picked = "other"
    return wall, picked


def main() -> int:
    from pyspark.sql import functions as F

    from arthur_redshift_etl_spark.session import build_session

    spark = build_session(
        app_name="broadcast-crossover",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        fact = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = spark.read.parquet(f"{SRC}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        n_fact = fact.count()
        n_orders = orders.count()
        report = {"source": SRC, "fact_rows": n_fact, "dims": []}
        default_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        for d_rows in DIMS:
            if d_rows > n_orders:
                continue
            # deterministic sample: modulo stride over the orderkey space
            stride = max(1, round(n_orders / d_rows))
            dim = orders.filter((F.col("o_orderkey") % stride) == 0)
            dim.write.mode("overwrite").parquet("/tmp/xover_dim")
            dim = spark.read.parquet("/tmp/xover_dim")
            actual = dim.count()
            dim_bytes = sum(
                os.path.getsize(os.path.join("/tmp/xover_dim", f))
                for f in os.listdir("/tmp/xover_dim")
                if f.endswith(".parquet")
            )
            row = {
                "dim_rows": actual,
                "dim_parquet_mb": round(dim_bytes / 2**20, 1),
            }
            for strategy in ("broadcast", "shuffle", "auto"):
                if strategy == "shuffle":
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                else:
                    spark.conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", default_thresh
                    )
                hint = "broadcast" if strategy == "broadcast" else "none"
                run_join(spark, fact, dim, hint)  # warm
                walls, picked = [], None
                for _ in range(REPS):
                    w, picked = run_join(spark, fact, dim, hint)
                    walls.append(w)
                row[strategy + "_s"] = round(min(walls), 3)
                row[strategy + "_plan"] = picked
            row["broadcast_speedup_vs_shuffle"] = round(
                row["shuffle_s"] / row["broadcast_s"], 2
            )
            report["dims"].append(row)
            print(f"# {row}", file=sys.stderr)
        out_path = os.environ.get("SPARK_GRAFT_XOVER_OUT")
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(report, fh)
        print(json.dumps(report))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
