#!/usr/bin/env python3
"""Small-file A/B: measure what fragmentation costs a scan, and what
``loader.compact_table`` buys back.

Incremental merges, streaming micro-batches, and per-batch loads each
leave their own part files (SCALE.md round-3 notes); this harness puts
NUMBERS on the decay.  On the sf1.0 tier lineitem (~6M rows, ~190 MB):

1. write three layouts of the same table — frag4096 (~50 KB files,
   simulating thousands of merge/stream cycles), frag512, and compact
   (coalesced to the 128 MB target ``compact_table`` uses);
2. per layout measure: first-read listing+index build (the driver/NN
   metadata cost that dominates at 100 TB object stores), a warm
   selective scan+agg (q06 shape), and a warm full-scan agg (q01 shape);
3. run the REAL ``compact_table`` verb end-to-end on a lake table
   fragmented in place: files before/after, rewrite wall (including the
   content-checksum gate), and the scan time it restores.

Local-FS listing is ~100x cheaper than S3/HDFS listing, so the listing
column here is a LOWER bound on the 100 TB benefit; the per-file open +
task-overhead cost in the scan columns transfers directly.

Run ALONE (32-core contention trap):  python scripts/small_files_compaction_ab.py
Env: SPARK_GRAFT_AB_SRC (default /tmp/spark_graft_sf1/lineitem.parquet;
     falls back to $SPARK_GRAFT_SF_DIR/lineitem.parquet when absent)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/tmp/spark_graft_sf1/lineitem.parquet"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SRC = os.environ.get(
    "SPARK_GRAFT_AB_SRC", SF1 if os.path.isdir(SF1) else f"{SF_DIR}/lineitem.parquet"
)
WORK = "/tmp/small_files_ab"
LAYOUTS = {"frag4096": 4096, "frag512": 512, "compact": 0}  # 0 = coalesce to target
TARGET_FILE_BYTES = 128 << 20
REPS = 3


def parquet_files(path: str) -> list:
    return [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]


def q06_agg(df):
    from pyspark.sql import functions as F

    return (
        df.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
        .collect()
    )


def q01_agg(df):
    from pyspark.sql import functions as F

    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
        .collect()
    )


def measure_layout(spark, path: str) -> dict:
    # first spark.read of a path builds the InMemoryFileIndex: the
    # listing/metadata cost a fragmented table pays on every fresh reader
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = spark.read.parquet(path)
    listing_s = time.perf_counter() - t0
    q06_agg(df)  # warm codegen/footers; the FileStatusCache now holds the listing
    sel, full = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        q06_agg(spark.read.parquet(path))
        sel.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        q01_agg(spark.read.parquet(path))
        full.append(time.perf_counter() - t0)
    files = parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    return {
        "files": len(files),
        "avg_file_kb": round(total / len(files) / 1024, 1),
        "listing_s": round(listing_s, 3),
        # what the SAME layout costs on an object store, modeled: S3
        # ListObjectsV2 returns <=1000 keys/page at ~25-50 ms/page
        # (sequential — continuation tokens serialize paging within a
        # prefix), plus one ~15 ms GET per parquet FOOTER at planning
        # (footers are fetched in parallel; schema merge reads one, but
        # row-group pruning touches every file once) amortized over the
        # driver's thread pool (~8 effective lanes).  Local-FS getdents
        # hides both, so listing_s above UNDERSTATES the fragmentation
        # tax by exactly this column.
        "s3_listing_model_s": round(
            (len(files) + 999) // 1000 * 0.035 + len(files) * 0.015 / 8, 3
        ),
        "scan_selective_s": round(min(sel), 3),
        "scan_full_s": round(min(full), 3),
        "scan_tasks": spark.read.parquet(path).rdd.getNumPartitions(),
    }


def compact_verb_e2e(spark, src_df) -> dict:
    """The real compact_table on a lake table fragmented in place."""
    from arthur_redshift_etl_spark.bootstrap import bootstrap_source_design
    from arthur_redshift_etl_spark.loader import (
        LoadContext,
        compact_table,
        load_warehouse,
    )
    from arthur_redshift_etl_spark.monitor import EventStore
    from arthur_redshift_etl_spark.relations import Relation

    lake = os.path.join(WORK, "lake")
    data = os.path.join(WORK, "src_data")
    src_df.write.mode("overwrite").parquet(data)
    design = bootstrap_source_design(src_df, "abdb.lineitem_ab", "up.public.lineitem")
    rel = Relation(design=design, data_location=data)
    ctx = LoadContext(spark=spark, data_root=lake, store=EventStore())
    load_warehouse(ctx, [rel])
    loc = (
        spark.sql("DESCRIBE FORMATTED `abdb`.`lineitem_ab`")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
        .replace("file:", "")
    )
    # fragment production storage in place (what N merge cycles leave)
    frag_tmp = os.path.join(WORK, "frag_tmp")
    spark.read.parquet(loc).repartition(4096).write.mode("overwrite").parquet(frag_tmp)
    shutil.rmtree(loc)
    shutil.move(frag_tmp, loc)
    spark.catalog.refreshTable("`abdb`.`lineitem_ab`")

    t0 = time.perf_counter()
    q01_agg(spark.table("`abdb`.`lineitem_ab`"))
    scan_before = time.perf_counter() - t0

    ctx2 = LoadContext(spark=spark, data_root=lake, store=EventStore())
    t0 = time.perf_counter()
    files_before, files_after = compact_table(
        ctx2, rel, db="abdb", target_file_bytes=TARGET_FILE_BYTES
    )
    rewrite_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    q01_agg(spark.table("`abdb`.`lineitem_ab`"))
    scan_after = time.perf_counter() - t0
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rewrite_incl_checksum_gate_s": round(rewrite_s, 2),
        "scan_full_before_s": round(scan_before, 3),
        "scan_full_after_s": round(scan_after, 3),
    }


def main() -> int:
    from arthur_redshift_etl_spark.session import build_session

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = build_session(
        app_name="small-files-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        src = spark.read.parquet(SRC)
        n = src.count()
        report = {"source": SRC, "rows": n, "layouts": {}, "compact_table": {}}
        for name, parts in LAYOUTS.items():
            path = os.path.join(WORK, name)
            if parts:
                src.repartition(parts).write.mode("overwrite").parquet(path)
            else:
                bytes_total = sum(
                    os.path.getsize(os.path.join(SRC, f))
                    for f in os.listdir(SRC)
                    if f.endswith(".parquet")
                )
                k = max(1, -(-bytes_total // TARGET_FILE_BYTES))
                src.coalesce(k).write.mode("overwrite").parquet(path)
            report["layouts"][name] = measure_layout(spark, path)
            print(f"# {name}: {report['layouts'][name]}", file=sys.stderr)
        report["compact_table"] = compact_verb_e2e(spark, src)
        print(f"# compact_table: {report['compact_table']}", file=sys.stderr)
        out_path = os.environ.get("SPARK_GRAFT_AB_OUT")
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(report, fh)
        print(json.dumps(report))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
