"""MinHash-LSH banding-parameter sweep (r11): price the (num_hashes,
rows_per_band) knobs instead of folklore — the dedup analog of the PQ
codebook-size curve.

For each config, candidates from the shipped lsh_candidate_pairs banding
vs EXACT trigram-Jaccard >= 0.5 ground truth (computed once per tier):
recall, precision, and the candidate-pair count that the verify stage
must pay for.  The S-curve intuition made concrete: more bands (same
hashes) = higher recall + more candidates; longer bands = sharper
threshold = fewer false candidates.

Run ALONE: PYTHONPATH=/root/repo python scripts/minhash_band_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark.operators import dedup as dd  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import t  # noqa: E402

CONFIGS = [(8, 2), (8, 4), (16, 2), (16, 4), (16, 8)]
TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = build_session(
        "minhash-band-sweep", extra_conf={"spark.ui.enabled": "false"}
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
        for num_hashes, rows_per_band in CONFIGS:
            sigs = dd.minhash_signatures(
                docs, "doc_id", "text", num_hashes=num_hashes
            )
            cand = dd.lsh_candidate_pairs(
                sigs, "doc_id", num_hashes=num_hashes,
                rows_per_band=rows_per_band,
            ).localCheckpoint(eager=True)
            n_cand = cand.count()
            n_hit = cand.join(truth, ["id_a", "id_b"]).count()
            tier[f"h{num_hashes}_r{rows_per_band}"] = {
                "bands": num_hashes // rows_per_band,
                "n_candidates": n_cand,
                "recall": round(n_hit / n_truth, 4) if n_truth else None,
                "precision": round(n_hit / n_cand, 4) if n_cand else None,
            }
        out[os.path.basename(sf)] = tier
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
