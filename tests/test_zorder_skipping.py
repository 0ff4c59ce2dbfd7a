"""Z-order data skipping, proven end-to-end (VERDICT r5 next-round #6).

Writes orders three ways — by o_orderkey (no clustering on the query
columns), by o_custkey (1-D perfect), Morton z-ordered on
(o_custkey, o_totalprice) — with small parquet row groups, then pins:

1. footer truth: the z-ordered layout's per-row-group min-max spans are
   tighter than an UNCLUSTERED layout's in EACH dimension (a 1-D sort is
   unclustered in the other column);
2. executed-plan truth: Spark's scan reads fewer rows (row groups pruned
   by parquet min-max against the pushed predicate) from the z-ordered
   layout than from a layout with no clustering on the predicate column.

The measured sf0.1 A/B (SCALE.md, scripts/zorder_skipping_ab.py) carries
the full three-layout x three-predicate matrix; this test pins the shape
at sf0.01 so a regression in the key math or the write path fails by name.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from arthur_redshift_etl_spark.operators.zorder import write_zordered
from arthur_redshift_etl_spark.plans.metrics import scan_summary

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
WRITER_OPTS = {"parquet.block.size": 64 * 1024, "parquet.page.size": 16 * 1024}
NUM_FILES = 4
COLS = ("o_custkey", "o_totalprice")


def _avg_spans(path: str) -> dict:
    spans = {c: [] for c in COLS}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            for c in COLS:
                st = md.row_group(g).column(idx[c]).statistics
                spans[c].append(float(st.max) - float(st.min))
    assert all(len(s) >= 8 for s in spans.values()), (
        "need several row groups for the pin to be meaningful: "
        f"{ {c: len(s) for c, s in spans.items()} }"
    )
    return {c: sum(s) / len(s) for c, s in spans.items()}


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder_ab"))
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    paths = {}
    for name, col in (("by_orderkey", "o_orderkey"), ("by_custkey", "o_custkey")):
        p = f"{base}/{name}"
        w = (
            orders.repartitionByRange(NUM_FILES, F.col(col))
            .sortWithinPartitions(col)
            .write.mode("overwrite")
        )
        for k, v in WRITER_OPTS.items():
            w = w.option(k, v)
        w.parquet(p)
        paths[name] = p
    zp = f"{base}/zorder"
    write_zordered(orders, zp, COLS, num_files=NUM_FILES, options=WRITER_OPTS)
    paths["zorder"] = zp
    return paths


def test_zorder_rowgroup_stats_tighter_in_both_dims(layouts):
    z = _avg_spans(layouts["zorder"])
    by_ok = _avg_spans(layouts["by_orderkey"])
    by_ck = _avg_spans(layouts["by_custkey"])
    # vs the unclustered layout, z-order tightens BOTH columns
    assert z["o_custkey"] < 0.8 * by_ok["o_custkey"], (z, by_ok)
    assert z["o_totalprice"] < 0.8 * by_ok["o_totalprice"], (z, by_ok)
    # vs the 1-D custkey sort, z-order tightens the NON-sorted column —
    # the dimension where a single-key layout gives zero skipping
    assert z["o_totalprice"] < 0.8 * by_ck["o_totalprice"], (z, by_ck)


def _rows_scanned(spark, path: str, lo: float, hi: float) -> tuple:
    df = (
        spark.read.parquet(path)
        .filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi))
        .select("o_orderkey", "o_totalprice")
    )
    n = len(df.collect())  # executes THIS plan so scan metrics populate
    return scan_summary(df)["rows_scanned"], n


def test_zorder_scan_prunes_rowgroups_on_secondary_dim(spark, layouts):
    """A price-range predicate must read fewer rows from the z-ordered
    layout than from the custkey-sorted one (which cannot skip on price) —
    this is the executed FileSourceScan's own numOutputRows, i.e. real
    parquet row-group pruning, not a footer simulation."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lo, hi = orders.approxQuantile("o_totalprice", [0.45, 0.55], 0.001)
    scanned_1d, n_1d = _rows_scanned(spark, layouts["by_custkey"], lo, hi)
    scanned_z, n_z = _rows_scanned(spark, layouts["zorder"], lo, hi)
    assert n_1d == n_z  # same answer
    total = orders.count()
    assert scanned_1d == total, "custkey sort should skip nothing on price"
    assert scanned_z < 0.75 * total, (scanned_z, total)
