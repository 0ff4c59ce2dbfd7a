#!/usr/bin/env python3
"""Measured A/B: full-stratum rank window vs two-phase grouped rank under
a planted 90%-mass stratum — same answers, bounded tasks.

Backs the round-8 fix of VERDICT r07 item 1: ``stratified_sample_exact``
and ``corpus_temperature_mix``'s selection rank used
``row_number() OVER (PARTITION BY source ORDER BY ...)``, which sorts an
ENTIRE stratum in one task.  Real corpora are domain-skewed — one
web-crawl source is routinely >90% of rows — so at 100 TB that window is
a single-task straggler/OOM.  The replacement
(``operators.identity.grouped_row_number``) is the range-partition +
local-rank + metadata-prefix-sum shape: the giant stratum spreads over
many range partitions; no task ever holds more than a partition's share.

Setup: documents at $SPARK_GRAFT_SF_DIR, replicated FACT_COPIES times,
with 90% of rows remapped to one planted source ('webcrawl_hot').  Both
implementations compute ceil(20%)-per-stratum samples; the A/B reports

  - wall time of each,
  - the MAX single-task sort size (rows) each plan produces — the
    straggler evidence: the window funnels ~90% of the corpus through one
    task regardless of parallelism, the grouped rank's max task stays at
    ~|corpus| / shuffle-partitions,
  - identical result checksums (count + sum of doc_id xor-folded), the
    correctness gate.

Run ALONE (32-core contention trap):  python scripts/stratified_skew_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACT_COPIES = int(os.environ.get("SPARK_GRAFT_STRAT_COPIES", "200"))
HOT_FRAC = 0.9
FRACTION = 0.2


def checksum(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") % F.lit(1_000_003)).alias("s"),
    ).first()
    return (r["n"], int(r["s"] or 0))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from arthur_redshift_etl_spark.operators.identity import grouped_row_number
    from arthur_redshift_etl_spark.operators.sampling import hash_bucket
    from arthur_redshift_etl_spark.session import build_session

    spark = build_session(
        app_name="stratified-skew-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            # make the ~30 MB demo behave like 100 TB defaults would: a
            # small AQE advisory size keeps the range shuffle at many
            # partitions instead of coalescing the whole demo into one
            # (at production scale partitions are data-bound either way;
            # same trick as skew_stress.py's lowered skew thresholds)
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        },
    )

    base = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "source")
    copies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(FACT_COPIES)
    ]
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionAll(c)
    # plant the 90%-mass stratum on a deterministic hash of the id
    docs = docs.withColumn(
        "source",
        F.when(
            (F.col("doc_id") * 2654435761) % 4294967296 % 100
            < int(HOT_FRAC * 100),
            F.lit("webcrawl_hot"),
        ).otherwise(F.col("source")),
    )
    docs = docs.withColumn("_hb", hash_bucket(F.col("doc_id")))
    docs = docs.persist()
    n_total = docs.count()
    n_hot = docs.filter(F.col("source") == "webcrawl_hot").count()

    def naive():
        w = Window.partitionBy("source")
        ranked = docs.withColumn(
            "_rn", F.row_number().over(w.orderBy(F.col("_hb"), F.col("doc_id")))
        ).withColumn("_n", F.count(F.lit(1)).over(w))
        return ranked.filter(
            F.col("_rn") <= F.ceil(F.lit(FRACTION) * F.col("_n"))
        ).select("doc_id", "source")

    def two_phase():
        ranked = grouped_row_number(
            docs, ["source"], ["_hb", "doc_id"],
            row_number_column="_rn", count_column="_n",
        )
        return ranked.filter(
            F.col("_rn") <= F.ceil(F.lit(FRACTION) * F.col("_n"))
        ).select("doc_id", "source")

    results = {}
    for name, fn in (("naive_window", naive), ("two_phase_grouped", two_phase)):
        t0 = time.perf_counter()
        df = fn()
        cs = checksum(df)
        wall = time.perf_counter() - t0
        # straggler evidence: the max rows any shuffle partition received.
        # For the window, rows hash-partition by source -> the hot stratum's
        # partition holds ~n_hot rows; for the grouped rank, the range
        # shuffle spreads it -> max ~ n_total / shuffle partitions.
        if name == "naive_window":
            part_rows = (
                docs.withColumn(
                    "_p", F.pmod(F.hash(F.col("source")), F.lit(32))
                )
                .groupBy("_p").count().agg(F.max("count")).first()[0]
            )
        else:
            part_rows = (
                docs.repartitionByRange(F.col("source"), F.col("_hb"), F.col("doc_id"))
                .withColumn("_p", F.spark_partition_id())
                .groupBy("_p").count().agg(F.max("count")).first()[0]
            )
        results[name] = {
            "wall_sec": round(wall, 2),
            "checksum": cs,
            "max_single_task_sort_rows": int(part_rows),
        }

    out = {
        "sf_dir": SRC,
        "fact_copies": FACT_COPIES,
        "rows_total": n_total,
        "rows_hot_stratum": n_hot,
        "hot_mass_pct": round(100.0 * n_hot / n_total, 1),
        "results": results,
        "checksums_match": results["naive_window"]["checksum"]
        == results["two_phase_grouped"]["checksum"],
    }
    print(json.dumps(out))
    if not out["checksums_match"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
