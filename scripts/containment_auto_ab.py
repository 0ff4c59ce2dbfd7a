"""Containment regime re-measurement (VERDICT r13 #3) — the receipt for
DROPPING auto-select.

r12 measured the naive all-shared-shingle join 8x faster than the prefix
filter on duplicate-saturated corpora and shipped prefix_filter=False as
the documented regime for them.  This script re-measures both regimes on
post-r13 code (hash-keyed candidate stages, row-local prefix selection)
over both corpus shapes, plus the duplicated-occurrence stat an auto-pick
would have used.  Measured 2026-08-18 (32 cores, sf0.1 base):

  | corpus               | dup stat | prefix wall | naive wall | pairs  |
  |-----------------------|----------|-------------|------------|--------|
  | 5k docs (sparse answers) | 999/1000 | 7.45 s   | 30.06 s    | 511    |
  | 20k docs (4x near-dups)  | 999/1000 | 156.6 s  | 582.1 s    | 68 176 |

Two conclusions, both encoded back into containment_join's docstring:
  1. The r12 crossover NO LONGER EXISTS — prefix wins both shapes 3.7-4.0x,
     so there is nothing for an auto-select to arbitrate; and
  2. the duplicated-occurrence fraction cannot discriminate anyway: the
     template-generated sf0.1 corpus reads 999/1000 "saturated" while the
     prefix filter wins it 4x (answer density, not shingle duplication, is
     what mattered — and answers are not cheaply estimable).

Outputs are asserted identical between regimes at every tier.

Run ALONE: PYTHONPATH=/root/repo python scripts/containment_auto_ab.py
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
COPIES_TIERS = [1, 4]
if os.environ.get("SPARK_GRAFT_AB_FULL") == "1":
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


def dup_milli(docs) -> int:
    """The duplicated-occurrence stat the dropped auto-pick would have used
    (kept here for the record): share of (doc, shingle) rows whose shingle
    appears in >= 2 docs, in milli-units."""
    sh = dd.doc_shingles(docs, "doc_id", "text", 3)
    stats = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .agg(
            F.sum("doc_freq").alias("occ"),
            F.sum(
                F.when(F.col("doc_freq") >= 2, F.col("doc_freq")).otherwise(0)
            ).alias("dup_occ"),
        )
        .collect()[0]
    )
    if not stats["occ"]:
        return 0
    return (1000 * int(stats["dup_occ"])) // int(stats["occ"])


def run(docs, pf):
    return dd.containment_join(
        docs, "doc_id", "text", threshold=0.8, min_size=5, prefix_filter=pf
    )


def main() -> None:
    spark = build_session(
        "containment-regime-ab",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF, "tiers": {}}
    for copies in COPIES_TIERS:
        docs = corpus(spark, copies)
        n = docs.count()
        tier = {"dup_milli": dup_milli(docs)}
        rows = {}
        for pf in (True, False):
            side = {True: "prefix", False: "naive"}[pf]
            run(docs, pf).count()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = sorted(tuple(r) for r in run(docs, pf).collect())
            tier[f"{side}_wall_s"] = round(time.perf_counter() - t0, 2)
            tier[f"{side}_pairs"] = len(res)
            rows[side] = res
            spark.catalog.clearCache()
            print(
                f"# {n} docs (dup_milli={tier['dup_milli']}): {side} "
                f"{tier[f'{side}_wall_s']}s ({len(res)} pairs)",
                file=sys.stderr, flush=True,
            )
        assert rows["prefix"] == rows["naive"], f"{n} docs: regimes differ"
        tier["outputs_identical"] = True
        out["tiers"][f"{n}_docs"] = tier
        print(json.dumps(out), flush=True)  # partial progress survives a kill
    spark.stop()


if __name__ == "__main__":
    main()
