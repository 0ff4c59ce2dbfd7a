#!/usr/bin/env python3
"""Scaling stress for the round-4 catalog additions.

Default entries: ``doc_lm_crossentropy`` + ``corpus_token_budget_select``
over replicated documents, ``pca_power_iteration`` +
``pca_grouped_by_label`` over replicated embeddings.  Override with
comma-separated entry names in ``SPARK_GRAFT_STRESS_DOC_ENTRIES`` /
``SPARK_GRAFT_STRESS_EMB_ENTRIES``.

Replicates the sf0.1 documents/embeddings tables K-fold with key offsets
into a temp sf-dir and runs the EXACT catalog entries against each tier, so
the measured plan is the shipped plan.  Replication holds the vocabulary /
dimensionality constant while scaling rows — the realistic axis (vocab
grows sublinearly in corpus size; embedding dim is fixed), and the one that
exposes superlinear behavior in the shuffles: the LM's bigram-count and
score-join shuffles scale with corpus tokens, the probability table does
not; PCA's two 64-key vector-sum shuffles move <=64 rows per task at every
tier by construction.

Prints one JSON line per tier; paste rows into SCALE.md.

Usage: python scripts/lm_pca_stress.py [--doc-tiers 1,10,40]
       [--emb-tiers 1,25,100]
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


def replicate(spark, src: str, dst: str, table: str, key: str, factor: int):
    base = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    out = base.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    out = out.withColumn(key, F.col(key) + F.col("__r") * 10_000_000).drop("__r")
    out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
    return out.count()


def run_tier(spark, entry: str, table: str, key: str, factor: int):
    tmp = tempfile.mkdtemp(prefix=f"{entry}_x{factor}_")
    try:
        rows_in = replicate(spark, SF_DIR, tmp, table, key, factor)
        spark._jvm.System.gc()
        t0 = time.monotonic()
        n = REGISTRY[entry].fn(spark, tmp).count()
        wall = time.monotonic() - t0
        return {
            "entry": entry,
            "factor": factor,
            "rows_in": rows_in,
            "rows_out": n,
            "wall_s": round(wall, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-tiers", default="1,10,40")
    ap.add_argument("--emb-tiers", default="1,25,100")
    args = ap.parse_args()

    spark = build_session(
        "lm-pca-stress",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    doc_entries = os.environ.get(
        "SPARK_GRAFT_STRESS_DOC_ENTRIES",
        "doc_lm_crossentropy,corpus_token_budget_select",
    ).split(",")
    emb_entries = os.environ.get(
        "SPARK_GRAFT_STRESS_EMB_ENTRIES",
        "pca_power_iteration,pca_grouped_by_label",
    ).split(",")
    for entry in [e.strip() for e in doc_entries if e.strip()]:
        for factor in [int(x) for x in args.doc_tiers.split(",") if x]:
            row = run_tier(spark, entry, "documents", "doc_id", factor)
            print(json.dumps(row), flush=True)
    for entry in [e.strip() for e in emb_entries if e.strip()]:
        for factor in [int(x) for x in args.emb_tiers.split(",") if x]:
            row = run_tier(spark, entry, "embeddings", "vec_id", factor)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
