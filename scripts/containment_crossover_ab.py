"""Containment join: prefix-filter vs naive crossover (r12).

SCALE.md's r12 containment section claims the AllPairs crossover from
theory (prefix machinery is 3 fixed extra stages; it pays only once
common-shingle posting lists dominate).  This script MEASURES the
crossover: corpora of 2k/8k/32k docs built by unioning perturbed copies
of sf0.1 documents (each copy appends a copy-marker token, so copies are
near- but not exact duplicates and shingle postings grow with corpus
size), timed through (a) the shipped prefix-filtered
``dd.containment_join`` and (b) the naive all-shared-shingle join, with
both candidate-pair bills.

Run ALONE: PYTHONPATH=/root/repo python scripts/containment_crossover_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.operators import dedup as dd  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES_TIERS = [1, 4, 8]


def corpus(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copymark{i}")).alias("text"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.localCheckpoint(eager=True)


def naive(docs):
    sh = (
        docs.select("doc_id", F.explode(dd.shingles_col("text")).alias("shingle"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    inter = (
        sh.select(F.col("doc_id").alias("id_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("sa")),
            "id_a",
        )
        .filter(
            (F.expr("(inter_size * 1000000) div sa") >= 800000)
            & (F.col("sa") >= 5)
        )
        .select("id_a", "id_b")
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = build_session(
        "containment-crossover",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF, "mode": mode, "tiers": {}}
    for copies in COPIES_TIERS:
        docs = corpus(spark, copies)
        n = docs.count()
        tier = {}
        for side, fn in (
            ("prefix", lambda d: dd.containment_join(d, "doc_id", "text",
                                                     threshold=0.8)),
            ("naive", naive),
        ):
            if mode != "both" and side != mode:
                continue
            print(f"# {n} docs: {side} warm...", file=sys.stderr, flush=True)
            fn(docs).count()
            t0 = time.perf_counter()
            n_pairs = fn(docs).count()
            tier[f"{side}_wall_s"] = round(time.perf_counter() - t0, 2)
            tier[f"{side}_pairs"] = n_pairs
            print(f"# {n} docs: {side} {tier[f'{side}_wall_s']}s "
                  f"({n_pairs} pairs)", file=sys.stderr, flush=True)
        out["tiers"][f"{n}_docs"] = tier
        print(json.dumps(out), flush=True)  # partial progress survives a kill
    spark.stop()


if __name__ == "__main__":
    main()
