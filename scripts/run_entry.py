"""Run one catalog entry by name: rows, timing, optional formatted plan.

Usage:
  python scripts/run_entry.py q01_pricing_summary [--sf /root/testdata/sf0.01]
                                                  [--explain] [--limit 10]

The spot-check tool: what the driver's correctness pass does for one entry,
on demand.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import REGISTRY  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", choices=sorted(REGISTRY), metavar="entry")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args()

    spark = build_session(
        app_name=f"run-{args.name}",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    t0 = time.time()
    rows = df.collect()
    print(f"# {args.name}: {len(rows)} rows in {time.time() - t0:.2f}s @ {args.sf}")
    for r in rows[: args.limit]:
        print(r)
    if REGISTRY[args.name].oracle:
        print("# oracle SQL available — compare with DuckDB via the harness")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
