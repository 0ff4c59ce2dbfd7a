#!/usr/bin/env python3
"""Z-order data-skipping A/B: measure what the layout is worth.

Writes the orders table three ways — range-sorted by o_orderkey (the
"natural" load order: no clustering on the query columns), range-sorted by
o_custkey (perfect 1-D clustering), and Morton z-ordered on
(o_custkey, o_totalprice) — with small parquet row groups so min-max
pruning has granularity, then runs the same 2-D box predicate against each
and reports, from the executed plan's own scan metrics (rows that survived
parquet row-group pruning) and from the parquet footers directly
(row groups whose min-max overlaps the box):

  layout        rows_scanned   rowgroups_overlapping / total
  by_orderkey   ~all           ~all   (no clustering on either column)
  by_custkey    ~10%           ~10%   (perfect on custkey, none on price)
  zorder        ~1-3%          ~few   (tight in BOTH dimensions)

Run ALONE (32-core contention trap):  python scripts/zorder_skipping_ab.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_ZORDER_DIR", "/tmp/spark_graft_zorder_ab")
NUM_FILES = 8
# small row groups: the skipping unit — default 128 MiB would put the whole
# sf0.1 table in ~1 row group and hide the layout's effect
WRITER_OPTS = {"parquet.block.size": 128 * 1024, "parquet.page.size": 32 * 1024}
COLS = ("o_custkey", "o_totalprice")


def rowgroup_report(path: str, lo: dict, hi: dict) -> dict:
    """Footer-level truth: row groups whose min-max box overlaps the query
    box, per pyarrow — what a stats-aware reader must read."""
    import pyarrow.parquet as pq

    total = overlap = 0
    rows_total = rows_overlap = 0
    spans = {c: [] for c in COLS}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            rows_total += rg.num_rows
            hit = True
            for c in COLS:
                st = rg.column(idx[c]).statistics
                spans[c].append(float(st.max) - float(st.min))
                if st.max < lo[c] or st.min > hi[c]:
                    hit = False
            if hit:
                overlap += 1
                rows_overlap += rg.num_rows
    return {
        "rowgroups": total,
        "rowgroups_overlapping": overlap,
        "rows_in_overlapping": rows_overlap,
        "rows_total": rows_total,
        "avg_span": {c: round(sum(s) / max(len(s), 1), 2) for c, s in spans.items()},
    }


def main() -> None:
    from pyspark.sql import functions as F

    from arthur_redshift_etl_spark.operators.zorder import write_zordered
    from arthur_redshift_etl_spark.plans.metrics import scan_summary
    from arthur_redshift_etl_spark.session import build_session

    spark = build_session(
        app_name="zorder-ab",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")

    # middle-decile 2-D box: selective on both columns, away from the edges
    qk = orders.approxQuantile("o_custkey", [0.45, 0.55], 0.001)
    qp = orders.approxQuantile("o_totalprice", [0.45, 0.55], 0.001)
    # integer bounds for the integer column: a float literal would wrap the
    # long column in a CAST and disable parquet pushdown entirely
    lo = {"o_custkey": int(qk[0]), "o_totalprice": qp[0]}
    hi = {"o_custkey": int(qk[1]), "o_totalprice": qp[1]}

    shutil.rmtree(WORK, ignore_errors=True)
    layouts = {}
    for name, col in (("by_orderkey", "o_orderkey"), ("by_custkey", "o_custkey")):
        path = f"{WORK}/{name}"
        w = (
            orders.repartitionByRange(NUM_FILES, F.col(col))
            .sortWithinPartitions(col)
            .write.mode("overwrite")
        )
        for k, v in WRITER_OPTS.items():
            w = w.option(k, v)
        w.parquet(path)
        layouts[name] = path
    zpath = f"{WORK}/zorder"
    write_zordered(orders, zpath, COLS, num_files=NUM_FILES, options=WRITER_OPTS)
    layouts["zorder"] = zpath

    # Three query shapes: the 2-D box, and each dimension alone.  A 1-D
    # layout is unbeatable on ITS column and useless on the other; z-order
    # is the balanced layout that prunes all three.
    predicates = {
        "box_2d": COLS,
        "custkey_only": ("o_custkey",),
        "price_only": ("o_totalprice",),
    }
    results = {}
    for name, path in layouts.items():
        results[name] = {}
        for pname, pcols in predicates.items():
            cond = F.lit(True)
            plo = {c: lo[c] for c in pcols}
            phi = {c: hi[c] for c in pcols}
            for c in pcols:
                cond = cond & (F.col(c) >= plo[c]) & (F.col(c) <= phi[c])
            df = (
                spark.read.parquet(path)
                .filter(cond)
                .select("o_orderkey", "o_custkey", "o_totalprice")
            )
            t0 = time.perf_counter()
            n = len(df.collect())  # executes THIS plan, so its scan
            wall = time.perf_counter() - t0  # metrics are populated
            s = scan_summary(df)
            # footer truth for just the predicate's columns
            full_lo = {c: plo.get(c, float("-inf")) for c in COLS}
            full_hi = {c: phi.get(c, float("inf")) for c in COLS}
            rg = rowgroup_report(path, full_lo, full_hi)
            results[name][pname] = {
                "result_rows": n,
                "rows_scanned": s["rows_scanned"],
                "rowgroups_overlapping": rg["rowgroups_overlapping"],
                "rowgroups": rg["rowgroups"],
                "rows_in_overlapping": rg["rows_in_overlapping"],
                "wall_sec": round(wall, 3),
            }
            r = results[name][pname]
            print(
                f"# {name:12s} {pname:13s} rows_scanned={r['rows_scanned']:>8} "
                f"rowgroups={r['rowgroups_overlapping']:>3}/{r['rowgroups']} "
                f"result={n} wall={wall:.3f}s",
                file=sys.stderr,
            )
        results[name]["avg_span"] = rowgroup_report(path, lo, hi)["avg_span"]
    print(json.dumps({"sf_dir": SRC, "box": {"lo": lo, "hi": hi}, "layouts": results}))
    spark.stop()


if __name__ == "__main__":
    main()
