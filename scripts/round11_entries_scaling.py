"""Scaling tiers for the round-11 catalog entries.

Same protocol as round9_entries_scaling.py: each new entry at sf0.01 and
sf0.1 on the bench session shape, second-run walls (codegen-warm), wall
ratio against the 10x-facts input (embeddings grow 4x between these
tiers: 500 -> 2 000 vectors).

Run ALONE (host contention inflates everything):
    PYTHONPATH=/root/repo python scripts/round11_entries_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

ENTRIES = [
    "kmeans_trained_silhouette",
    "kmeans_trained_purity",
    "pq_adc_topk_trained_big",
    "ivfpq_residual_search",
    "ivf_l2_trained_buckets",
    "grouped_split_leakage_safe",
    "embedding_dim_stats",
    "duckdb_source_orders_by_status",
    "sqlite_source_orders_by_priority",
    "ngram_novelty_rate",
    "padding_waste_by_length_bucket",
    "dup_cluster_size_histogram",
    "simhash_recall_eval",
    "langid_holdout_confusion",
]

TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = build_session(
        app_name="r11-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in TIERS:
        for tbl in ("embeddings", "documents", "orders"):
            workload.t(spark, sf, tbl).count()

    out = {}
    for name in ENTRIES:
        fn = workload.REGISTRY[name].fn
        walls = []
        for sf in TIERS:
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
