"""Bloom filter sizing curve (r12): measured FPR across (bits, hashes)
vs the fill-ratio expectation (bits_set/m)^k — the sizing study every
other sketch family has (CMS width table, HLL register count, KLL
compaction), completing the Bloom quality loop.

Members = distinct sf0.1 customer keys (~15k); probes = the same count
of known non-members (key + 1e7).  For each config: fill ratio, measured
FPR, expected FPR, and bits-per-key — the number a 100 TB join-prefilter
sizing decision actually needs (the runtime_bloom_prefilter_join's build
side picks its width from exactly this curve).

Run ALONE: PYTHONPATH=/root/repo python scripts/bloom_sizing_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.operators import sketch as sk  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import t  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONFIGS = [
    (16_384, 2), (16_384, 4),
    (65_536, 2), (65_536, 4), (65_536, 6),
    (262_144, 4), (262_144, 6),
]


def main() -> None:
    spark = build_session(
        "bloom-sizing", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    members = (
        t(spark, SF, "customer")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = members.count()
    probes = members.select((F.col("k") + 10_000_000).alias("pk")).localCheckpoint(
        eager=True
    )
    out = {"sf_dir": SF, "n_members": n, "configs": {}}
    for m, k in CONFIGS:
        bits = sk.bloom_bits(members, "k", bits=m, hashes=k).localCheckpoint(
            eager=True
        )
        n_set = bits.count()
        n_miss = (
            sk.bloom_not_member(probes, bits, "pk", n_bits=m, hashes=k)
            .count()
        )
        fill = n_set / m
        out["configs"][f"m{m}_k{k}"] = {
            "bits_per_key": round(m / n, 2),
            "fill": round(fill, 4),
            "fpr_measured": round((n - n_miss) / n, 6),
            "fpr_expected": round(fill ** k, 6),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
