"""Scaling tiers for the round-12 catalog entries.

Same protocol as round9/10/11_entries_scaling.py: each new entry at
sf0.01 and sf0.1 on the bench session shape, second-run walls
(codegen-warm), wall ratio against the 10x-facts input (documents grow
4x: 500 -> 2 000 docs; embeddings 4x: 500 -> 2 000 vectors).

Run ALONE (host contention inflates everything):
    PYTHONPATH=/root/repo python scripts/round12_entries_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

ENTRIES = [
    "dedup_simhash64_near_pairs",
    "minhash_jaccard_estimate_error",
    "pq_reconstruction_error",
    "token_pmi_collocations",
    "quantile_normalize_embedding_dims",
    "temporal_split_events",
    "bloom_filter_fpr_check",
    "dedup_containment_pairs",
    "pq_code_utilization",
    "embedding_norm_outliers",
]

TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = build_session(
        app_name="r12-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in TIERS:
        for tbl in ("embeddings", "documents", "customer", "events"):
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
