"""Catalog-wide physical-plan inventory: per-entry Exchange/Python/NL-join
counts at sf0.001, printed as a markdown histogram.

Backs SCALE.md's shuffle-inventory narrative with generated numbers:
`python scripts/plan_inventory.py` (needs the repo on PYTHONPATH).
"""

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from arthur_redshift_etl_spark.plans.lint import plan_text  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import REGISTRY  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = build_session(
        app_name="plan-inventory",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    hist = Counter()
    heavy = []
    for name in sorted(REGISTRY):
        try:
            p = plan_text(REGISTRY[name].fn(spark, SF))
        except Exception as ex:  # noqa: BLE001
            print(f"| {name} | ERROR {str(ex)[:60]} |")
            continue
        n_ex = p.count(") Exchange")
        hist[n_ex] += 1
        if n_ex >= 5:
            heavy.append((n_ex, name))
    total = sum(hist.values())
    print(f"entries: {total}")
    print("| exchanges in plan | entries |")
    print("|---|---|")
    for k in sorted(hist):
        print(f"| {k} | {hist[k]} |")
    print()
    for n_ex, name in sorted(heavy, reverse=True):
        print(f"- {name}: {n_ex} exchanges")


if __name__ == "__main__":
    main()
