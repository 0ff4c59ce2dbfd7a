"""Arrow-vectorized (pandas/numpy) variants of the vector-math operators.

The JVM-side higher-order-function implementations in ``similarity.py`` are
the oracle-parity baselines (deterministic sequential arithmetic).  These
variants trade bit-exact summation order for BLAS throughput: one numpy
matrix multiply per Arrow batch instead of per-element Catalyst lambdas —
the right trade at 10^9 vectors where the dot products dominate.

Ranking output is identical in practice (cosine gaps dwarf float error);
the equivalence test asserts it on the synthetic data.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def brute_force_knn_vectorized(
    collection: DataFrame,
    queries_local: "pd.DataFrame",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors with numpy per Arrow batch.

    ``queries_local`` is a small pandas DataFrame (id, vector) captured on
    the driver and closed over into the UDF — the standard broadcast-small-
    side pattern.  Each executor computes a (batch × queries) matmul, keeps
    a per-batch top-k, and a final per-query window reduces across batches.
    """
    q_ids = queries_local[id_col].to_numpy()
    q_mat = np.stack(queries_local[vec_col].to_numpy()).astype(np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_norm[q_norm == 0.0] = 1.0  # zero vector stays zero (sim 0), not NaN
    q_mat /= q_norm

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0  # match similarity.normalized semantics
            mat /= norms
            sims = mat @ q_mat.T  # (batch, n_queries)
            rows: List[dict] = []
            top = min(k + 1, sims.shape[0])
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                # Tie-exact batch top-k (same scheme as
                # similarity.brute_force_knn_gemm): threshold at the
                # top-th largest sim, keep ALL ties at the boundary, then
                # lexsort (sim desc, id asc) — a bare argpartition splits
                # equal-sim rows arbitrarily, which matters for mass ties
                # (a zero-norm query scores 0.0 against everything).
                v = np.partition(col, col.shape[0] - top)[col.shape[0] - top]
                cand = np.flatnonzero(col >= v)
                order = np.lexsort((ids[cand], -col[cand]))[:top]
                for j in cand[order]:
                    if ids[j] != q_ids[qi]:
                        rows.append(
                            {
                                "query_id": int(q_ids[qi]),
                                "neighbor_id": int(ids[j]),
                                "sim": float(col[j]),
                            }
                        )
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    scored = collection.select(id_col, vec_col).mapInPandas(run, out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
