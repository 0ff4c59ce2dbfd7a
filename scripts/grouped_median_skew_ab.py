"""Grouped weighted median under planted group skew: offset-cumsum vs
naive stratum window.

Synthesizes N rows where one group holds 90% of the mass (the web-crawl
domain shape), then computes the per-group weighted median two ways:

- naive: SUM(w) OVER (PARTITION BY grp ORDER BY val) — the banned shape;
  the hot group's entire value table sorts in ONE task;
- engine: the weighted_median_by_flag machinery — one GLOBAL running sum
  over (grp, val) (range shuffle splits the hot group across partitions)
  + broadcast per-group offsets.

Results must agree exactly (checksum over the output rows); the walls
show whether the offset trick actually buys anything at this scale.

Run ALONE:
    PYTHONPATH=/root/repo python scripts/grouped_median_skew_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.operators.identity import (  # noqa: E402
    global_running_sum,
)
from arthur_redshift_etl_spark.plans.broadcast import (  # noqa: E402
    broadcast_within_budget,
)
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

N = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "5000000"))
GROUPS = 10  # group 0 carries 90% of rows, the rest share 10%


def main() -> None:
    spark = build_session(
        app_name="gm-skew-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 90/10 split; distinct double values so the grouped table stays large
    base = spark.range(N).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % (GROUPS - 1)) + 1)
        .cast("int")
        .alias("grp"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000_000)).cast("double") / 100)
        .alias("val"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50)) + 1)
        .cast("long")
        .alias("w"),
    )
    v = base.groupBy("grp", "val").agg(F.sum("w").alias("w"))
    v = v.localCheckpoint()  # both paths read the same materialized input
    n_distinct = v.count()

    def run(df) -> tuple[float, tuple]:
        t0 = time.perf_counter()
        rows = sorted(tuple(r) for r in df.collect())
        return time.perf_counter() - t0, tuple(rows)

    # naive stratum window
    wspec = (
        Window.partitionBy("grp")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = v.groupBy("grp").agg(F.sum("w").alias("wg"))
    naive = (
        v.withColumn("cumw", F.sum("w").over(wspec))
        .join(tot, "grp")
        .filter(F.lit(2) * F.col("cumw") >= F.col("wg"))
        .groupBy("grp", "wg")
        .agg(F.min("val").alias("med"))
        .select("grp", "med", "wg")
    )
    naive_wall, naive_rows = run(naive)

    # engine path (weighted_median_by_flag shape)
    cum, _ = global_running_sum(v, ["grp", "val"], "w", "gcum")
    offs = cum.groupBy("grp").agg(
        F.min(F.col("gcum") - F.col("w")).alias("off"),
        F.sum("w").alias("wg"),
    )
    k = offs.count()
    eng = (
        cum.join(
            broadcast_within_budget(
                offs.select(F.col("grp").alias("__g"), "off", "wg"), k
            ),
            F.col("grp") == F.col("__g"),
        )
        .filter(F.lit(2) * (F.col("gcum") - F.col("off")) >= F.col("wg"))
        .groupBy("grp", "wg")
        .agg(F.min("val").alias("med"))
        .select("grp", "med", "wg")
    )
    eng_wall, eng_rows = run(eng)

    assert naive_rows == eng_rows, "paths disagree"
    print(
        json.dumps(
            {
                "rows": N,
                "distinct_group_vals": n_distinct,
                "hot_group_share": 0.9,
                "naive_window_s": round(naive_wall, 3),
                "engine_offset_cumsum_s": round(eng_wall, 3),
                "speedup": round(naive_wall / eng_wall, 2),
                "identical_results": True,
            }
        )
    )


if __name__ == "__main__":
    main()
