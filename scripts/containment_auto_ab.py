"""Place and verify containment_join(prefix_filter="auto") (VERDICT r13 #3).

For each corpus tier (1x sparse sf0.1 documents; 4x/8x perturbed near-
duplicate copies — the saturated shape where r12 measured the naive regime
8x faster) this script:

  1. computes the auto stat (duplicated-occurrence fraction, milli-units)
     exactly as containment_join computes it,
  2. times prefix / naive / auto warm walls through the real operator,
  3. asserts the three result sets are row-identical (sorted tuples).

The printed table is the receipt for CONTAINMENT_SATURATION_MILLI: the
threshold must separate the measured tier stats with margin, and "auto"
must match the faster regime's wall on both shapes.

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
    return (1000 * int(stats["dup_occ"])) // int(stats["occ"])


def run(docs, pf):
    return dd.containment_join(
        docs, "doc_id", "text", threshold=0.8, min_size=5, prefix_filter=pf
    )


def main() -> None:
    spark = build_session(
        "containment-auto-ab",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF, "threshold_milli": dd.CONTAINMENT_SATURATION_MILLI,
           "tiers": {}}
    for copies in COPIES_TIERS:
        docs = corpus(spark, copies)
        n = docs.count()
        tier = {"dup_milli": dup_milli(docs)}
        rows = {}
        for pf in (True, False, "auto"):
            side = {True: "prefix", False: "naive", "auto": "auto"}[pf]
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
        assert rows["prefix"] == rows["naive"] == rows["auto"], (
            f"{n} docs: regime outputs differ"
        )
        tier["outputs_identical"] = True
        out["tiers"][f"{n}_docs"] = tier
        print(json.dumps(out), flush=True)  # partial progress survives a kill
    spark.stop()


if __name__ == "__main__":
    main()
