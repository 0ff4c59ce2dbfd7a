#!/usr/bin/env python3
"""Duplicate-heavy MinHash-LSH stress at the next tier (500k docs).

Builds a corpus of ``TARGET_DOCS`` documents from the sf0.1 documents table:
each source doc is replicated into near-dup groups of 10 (variant k deletes
the k-th token), so the true pair inventory is known up front
(``groups × 45``).  Runs the full ``minhash_dedup_pairs`` pipeline through
the lake-checkpoint path (``materialize_dir``) — the configuration the
100 TB deployment would use, where the shingle intermediate outlives
executor memory and task retries re-read parquet instead of recomputing the
shingle pipeline.

Usage:  python scripts/dedup_stress.py [--docs 500000]
Prints one JSON line with stage timings and pair counts; paste the row into
SCALE.md's measured-scaling table.
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

from arthur_redshift_etl_spark.operators import dedup as dd  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

GROUP = 10  # near-dup variants per group


def build_corpus(spark, sf_dir: str, target_docs: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").alias("id"), "text"
    )
    n_source = docs.count()
    groups = target_docs // GROUP
    if groups <= n_source:
        base = docs.filter(F.col("id") < groups)
        reps = 1
    else:
        reps = -(-groups // n_source)  # ceil
        base = docs
    replicated = (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .withColumn("group_id", F.col("id") * reps + F.col("rep"))
        .filter(F.col("group_id") < groups)
        .select("group_id", "text")
    )
    # Salt every token with the group id: groups sharing a base doc become
    # shingle-disjoint, so the true pair inventory is exactly groups × 45
    # (without this, two groups cloned from the same source doc would be
    # near-dups of each other and the inventory would blow up ~100×).
    # Then 10 variants per group: variant v deletes token v (token arrays
    # are longer than GROUP for every doc in this corpus).
    variants = (
        replicated.withColumn(
            "toks",
            F.transform(
                F.split("text", " "),
                lambda x: F.concat(x, F.lit("~"), F.col("group_id").cast("string")),
            ),
        )
        .select(
            "group_id",
            "toks",
            F.posexplode(F.array_repeat(F.lit(1), GROUP)).alias("v", "_one"),
        )
        .select(
            (F.col("group_id") * GROUP + F.col("v")).alias("id"),
            F.concat_ws(
                " ",
                F.concat(
                    F.slice("toks", 1, F.col("v")),
                    F.expr(f"slice(toks, v + 2, size(toks))"),
                ),
            ).alias("text"),
        )
    )
    return variants, groups * GROUP, groups * (GROUP * (GROUP - 1) // 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = build_session(
        app_name="dedup-stress",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="dedup_stress_")
    try:
        t0 = time.perf_counter()
        corpus, n_docs, expected_pairs = build_corpus(
            spark, args.sf_dir, args.docs
        )
        corpus_path = os.path.join(workdir, "corpus")
        # spread the corpus across one file per core — the variant expansion
        # starts from a single source file, and a 1-file corpus would
        # serialize the shingle scan downstream
        corpus.repartition(int(args.cpus)).write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = dd.minhash_dedup_pairs(
            corpus, id_col="id", materialize_dir=os.path.join(workdir, "shingles")
        )
        n_pairs = pairs.count()
        t_dedup = time.perf_counter() - t0

        shingle_files = len(
            [
                f
                for f in os.listdir(os.path.join(workdir, "shingles"))
                if f.endswith(".parquet")
            ]
        )
        print(
            json.dumps(
                {
                    "docs": n_docs,
                    "expected_near_dup_pairs": expected_pairs,
                    "verified_pairs": n_pairs,
                    "build_sec": round(t_build, 2),
                    "dedup_sec": round(t_dedup, 2),
                    "checkpoint_part_files": shingle_files,
                    "pairs_per_sec": round(n_pairs / t_dedup),
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
