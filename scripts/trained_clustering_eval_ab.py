"""Trained-vs-init clustering quality A/B (VERDICT r10 #3).

Runs the init-only and 1-Lloyd-iteration-trained silhouette and purity
entries at sf0.01 and sf0.1 and prints the corpus-level metric deltas plus
second-run walls — the number that justifies (or indicts) the training
cost.  Corpus-level rollups: anchor-weighted mean silhouette, vector-
weighted purity.

Run ALONE (host contention inflates walls):
    PYTHONPATH=/root/repo python scripts/trained_clustering_eval_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

PAIRS = {
    "silhouette": ("kmeans_silhouette_eval", "kmeans_trained_silhouette"),
    "purity": ("cluster_purity_eval", "kmeans_trained_purity"),
}

TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rollup(metric: str, rows) -> float:
    if metric == "silhouette":
        w = sum(r["n_anchors"] for r in rows)
        return sum(r["mean_silhouette"] * r["n_anchors"] for r in rows) / w
    w = sum(r["n_total"] for r in rows)
    return sum(r["n_majority"] for r in rows) / w


def main() -> None:
    spark = build_session(
        app_name="trained-clustering-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in TIERS:
        workload.t(spark, sf, "embeddings").count()
        tier = {}
        for metric, (init_name, trained_name) in PAIRS.items():
            vals = {}
            for tag, name in (("init", init_name), ("trained", trained_name)):
                fn = workload.REGISTRY[name].fn
                fn(spark, sf).count()  # codegen warm-up
                t0 = time.time()
                rows = [r.asDict() for r in fn(spark, sf).collect()]
                vals[tag] = {
                    "value": round(_rollup(metric, rows), 6),
                    "wall_s": round(time.time() - t0, 3),
                    "clusters": len(rows),
                }
            vals["delta"] = round(
                vals["trained"]["value"] - vals["init"]["value"], 6
            )
            tier[metric] = vals
        out[os.path.basename(sf)] = tier
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
