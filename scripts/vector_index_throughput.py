"""Persistent vector-index path, priced (r12): build wall, artifact
sizes, and per-query search wall through the CLI-backed
``vector_index.build_vector_index`` / ``search_vectors`` stack vs the
in-entry ivfpq pipeline (which recomputes assignment + codebooks every
query).

What transfers to 100 TB: the build is the run-rarely cost (assignment =
one broadcast-join map over the corpus; training shuffle bounded by the
codebook); each search then reads the bounded JSON sidecars + the
assignment parquet and touches corpus/nlist coded rows.  The number that
matters is the SEARCH amortization: queries per second once the index
exists, vs rebuilding per query.

Run ALONE: PYTHONPATH=/root/repo python scripts/vector_index_throughput.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arthur_redshift_etl_spark import vector_index as vi  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402
from arthur_redshift_etl_spark.workload import t  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 10


def main() -> None:
    spark = build_session(
        "vector-index-throughput", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, SF, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    idx = tempfile.mkdtemp(prefix="vi_ab_")
    try:
        t0 = time.perf_counter()
        meta = vi.build_vector_index(
            spark, emb, idx, n_centroids=8, n_subspaces=4, train_iters=2
        )
        build_wall = round(time.perf_counter() - t0, 3)
        sizes = {
            f: os.path.getsize(os.path.join(idx, f))
            for f in ("meta.json", "centroids.json", "codebooks.json")
        }
        sizes["assignment.parquet"] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(idx, "assignment.parquet"))
            for f in fs
        )
        queries = [
            list(r["embedding"])
            for r in emb.filter(emb.vec_id % 97 == 3).limit(N_QUERIES).collect()
        ]
        # warm one search (codegen + sidecar load path)
        vi.search_vectors(spark, emb, idx, queries[0], k=5, nprobe=2).count()
        t0 = time.perf_counter()
        for q in queries:
            vi.search_vectors(spark, emb, idx, q, k=5, nprobe=2).count()
        search_wall = time.perf_counter() - t0
        # batch path: all N queries in ONE plan
        qdict = {i: q for i, q in enumerate(queries)}
        vi.search_vectors_batch(spark, emb, idx, qdict, k=5, nprobe=2).count()
        t0 = time.perf_counter()
        n_rows = vi.search_vectors_batch(
            spark, emb, idx, qdict, k=5, nprobe=2
        ).count()
        batch_wall = time.perf_counter() - t0
        assert n_rows == 5 * len(qdict), n_rows
        print(
            json.dumps(
                {
                    "sf_dir": SF,
                    "n_vectors": n,
                    "dim": meta["dim"],
                    "build_wall_s": build_wall,
                    "sidecar_bytes": sizes,
                    "searches": N_QUERIES,
                    "search_wall_s_per_query": round(search_wall / N_QUERIES, 3),
                    "batch_wall_s_per_query": round(batch_wall / N_QUERIES, 3),
                    "batch_speedup": round(search_wall / batch_wall, 1),
                }
            )
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
