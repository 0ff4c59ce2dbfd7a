"""Rollback cost vs table size: is per-table time travel metadata-bounded?

Builds the same relation twice (two lake versions) at two data sizes
(orders at sf0.01 and sf0.1, 10x rows) and times ``rollback_table``.
The re-point itself is catalog DDL; the only data-touching step is the
row-count audit, which on parquet is footer-driven (zero-column scan).
If the wall grows far slower than 10x, the audit is metadata-bounded and
the 100 TB rollback story holds; the printed split (audit vs register)
shows which half any growth lives in.

Run ALONE:
    PYTHONPATH=/root/repo python scripts/rollback_scale_ab.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark.design import ColumnDefinition, TableDesign  # noqa: E402
from arthur_redshift_etl_spark.loader import (  # noqa: E402
    LoadContext,
    load_warehouse,
    rollback_table,
    table_versions,
)
from arthur_redshift_etl_spark.monitor import EventStore  # noqa: E402
from arthur_redshift_etl_spark.relations import Relation  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

TIERS = {"sf0.01": "/root/testdata/sf0.01", "sf0.1": "/root/testdata/sf0.1"}


def orders_rel(spark, workdir: str, sf_dir: str) -> Relation:
    d = os.path.join(workdir, "data", "rb.orders")
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.mode("overwrite").parquet(d)
    return Relation(
        design=TableDesign(
            name="rb.orders",
            source_name="up.public.orders",
            columns=[
                ColumnDefinition("o_orderkey", "long", not_null=True),
                ColumnDefinition("o_custkey", "long"),
                ColumnDefinition("o_orderstatus", "string"),
                ColumnDefinition("o_totalprice", "double"),
                ColumnDefinition("o_orderdate", "timestamp"),
                ColumnDefinition("o_orderpriority", "string"),
            ],
        ),
        data_location=d,
    )


def main() -> None:
    spark = build_session(
        app_name="rollback-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tier, sf_dir in TIERS.items():
        workdir = tempfile.mkdtemp(prefix=f"rollback_ab_{tier}_")
        lake = os.path.join(workdir, "lake")
        ctxs = []
        rel = None
        for _ in range(2):
            rel = orders_rel(spark, workdir, sf_dir)
            ctx = LoadContext(spark=spark, data_root=lake, store=EventStore())
            load_warehouse(ctx, [rel])
            ctxs.append(ctx)
        versions = table_versions(ctxs[-1], rel)
        assert len(versions) == 2, versions
        t0 = time.perf_counter()
        info = rollback_table(ctxs[-1], rel, ctxs[0].etl_id)
        wall = time.perf_counter() - t0
        # split: how much of the wall is the audit scan alone?
        t1 = time.perf_counter()
        n = spark.read.parquet(info["location"]).count()
        audit = time.perf_counter() - t1
        out[tier] = {
            "rows": info["rows"],
            "rollback_wall_s": round(wall, 3),
            "audit_scan_s": round(audit, 3),
            "register_s": round(wall - audit, 3),
        }
        assert n == info["rows"]
        print(f"# {tier}: rollback {wall:.3f}s (audit ~{audit:.3f}s, "
              f"{info['rows']} rows)", file=sys.stderr)
        for db in ("rb", "etl_backup__rb", "etl_staging__rb"):
            spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
    r = out["sf0.1"]["rollback_wall_s"] / max(out["sf0.01"]["rollback_wall_s"], 1e-9)
    out["wall_ratio_10x_rows"] = round(r, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
