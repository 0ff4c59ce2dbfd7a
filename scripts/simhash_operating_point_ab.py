"""SimHash operating-point A/B (r12): measure the production knobs the r11
``simhash_recall_eval`` verdict named — 64-bit signatures / hamming <= 2 —
next to the shipped 32-bit / hamming <= 3 demo point.

The r11 eval showed 32/3 is a recall-heavy prefilter whose precision
collapses superlinearly with corpus size (1.7% at sf0.01 -> 0.18% at
sf0.1): the verify stage pays ~500 false candidates per true pair.  This
script prices the alternatives against the same EXACT trigram-Jaccard >=
0.5 ground truth: candidate count out of the pigeonhole blocking (what the
bit_count verify must scan), verified near-pair count, recall, precision.

Run ALONE: PYTHONPATH=/root/repo python scripts/simhash_operating_point_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.operators import dedup as dd  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import t  # noqa: E402

# (bits, max_hamming): the shipped demo point, the r11-named production
# point, and the two off-diagonal corners that separate the two knobs.
CONFIGS = [(32, 3), (32, 2), (64, 3), (64, 2)]
TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = build_session(
        "simhash-operating-point", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in TIERS:
        docs = t(spark, sf, "documents").localCheckpoint(eager=True)
        truth = (
            dd.ngram_jaccard_join(docs, threshold=0.5)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_truth = truth.count()
        tier = {"n_truth": n_truth}
        for bits, ham in CONFIGS:
            sims = dd.simhash(docs, "doc_id", "text", bits=bits).localCheckpoint(
                eager=True
            )
            # candidate count BEFORE the hamming verify — the pigeonhole
            # block-join output is the verify stage's bill
            cand = dd.simhash_candidate_pairs(
                sims, max_hamming=ham, bits=bits
            ).localCheckpoint(eager=True)
            n_cand = cand.count()
            near = cand.select(
                "id_a",
                "id_b",
                F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                .cast("int")
                .alias("hamming"),
            ).filter(F.col("hamming") <= ham)
            n_near = near.count()
            n_hit = near.select("id_a", "id_b").join(
                truth, ["id_a", "id_b"]
            ).count()
            tier[f"b{bits}_h{ham}"] = {
                "n_candidates": n_cand,
                "n_near": n_near,
                "recall": round(n_hit / n_truth, 4) if n_truth else None,
                "precision": round(n_hit / n_near, 4) if n_near else None,
            }
        out[os.path.basename(sf)] = tier
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
