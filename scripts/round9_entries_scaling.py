"""Scaling tiers for the round-9 catalog entries.

Runs each new entry at sf0.01 and sf0.1 (10x facts) on the bench session
shape and prints wall seconds + the scale ratio.  A ratio near-or-below
10x on a 10x input says the plan is work-proportional (the window/sweep
machinery adds no superlinear term); far below says the runtime is
dominated by fixed planning/shuffle-setup cost at these sizes.

Run ALONE (host contention inflates everything):
    PYTHONPATH=/root/repo python scripts/round9_entries_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

ENTRIES = [
    "peak_concurrent_sessions",
    "pareto_frontier_docs",
    "weighted_median_price",
    "rolling_7d_distinct_users",
    "winsorized_mean_price",
    "cohort_ltv_curve",
    "time_weighted_avg_value",
]

TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = build_session(
        app_name="r9-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm file listing + JVM so tier timings measure the queries
    for sf in TIERS:
        for tbl in ("events", "documents", "orders", "lineitem"):
            workload.t(spark, sf, tbl).count()

    out = {}
    for name in ENTRIES:
        fn = workload.REGISTRY[name].fn
        walls = []
        for sf in TIERS:
            # first run pays whole-stage codegen + JIT for this entry's
            # operators; the SECOND run is the tier-comparable number
            # (cold-vs-cold at both tiers would instead compare compile
            # costs, which don't scale with data)
            fn(spark, sf).count()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        ratio = round(walls[1] / walls[0], 2) if walls[0] else None
        out[name] = {"sf0.01": walls[0], "sf0.1": walls[1], "ratio": ratio, "rows": n}
        print(f"# {name}: {walls[0]}s -> {walls[1]}s  ratio {ratio} ({n} rows)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
