"""Scalar (int8-style) embedding quantization and quantized similarity search.

The memory lever for ANN at 100 TB: a float32 embedding column shrinks 4×
when stored as int8 codes, the integer dot products are exact (no float
summation-order nondeterminism — scores are bit-reproducible across
engines, retries and partitionings), and SIMD integer math is faster than
float on scan-heavy search.

Scheme: symmetric global-max scaling.  ``scale = max(|x|)`` over the whole
corpus (one scalar), ``q_j = floor(x_j * qmax / scale + 0.5)``.  The
``floor(x+0.5)`` form (not ``round``) is deliberate: every engine
evaluates the identical IEEE expression, so quantized codes match
bit-for-bit across Spark/DuckDB — round() half-case conventions differ
between engines.  The corpus max enters the plan as a broadcast 1-row
aggregate cross join (no driver collect, same pattern as
``daily_event_anomaly_zscore``).

Integer dot products of qmax=127 codes over ≤8k dims stay under 2^53, so
even a double-typed SQL engine computes them exactly — which is what makes
the quantized-ANN oracle entry value-hashable while the float ANN entries
can only compare ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_abs_max(df: DataFrame, col: str = "embedding") -> DataFrame:
    """1-row DataFrame with the corpus-wide max |component| (as double)."""
    elem_abs = F.transform(F.col(col), lambda x: F.abs(x.cast("double")))
    return df.select(F.array_max(elem_abs).alias("row_max")).agg(
        F.max("row_max").cast("double").alias("scale")
    )


def quantize(
    df: DataFrame, col: str = "embedding", qmax: int = 127, out_col: str = "q"
) -> DataFrame:
    """Add an int-code array column; keeps all other columns.

    The scale joins in as a broadcast single-row aggregate — one job, no
    driver round-trip, and every executor quantizes against the identical
    scalar.
    """
    scale = F.broadcast(corpus_abs_max(df, col))
    q = F.transform(
        F.col(col),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(qmax)) / F.col("scale") + F.lit(0.5)
        ).cast("int"),
    )
    return df.crossJoin(scale).withColumn(out_col, q).drop("scale")


def dequantize(
    df: DataFrame, scale: float, q_col: str = "q", qmax: int = 127,
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Inverse map (lossy): q * scale / qmax as double array."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda v: v.cast("double") * F.lit(scale) / F.lit(float(qmax)),
        ),
    )


def int_dot(a, b):
    """Exact integer dot product of two int-array columns (long-safe)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_knn(
    collection: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    q_col: str = "q",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k by exact integer dot product of quantized codes.

    Same shape as the float brute-force baseline (broadcast query set →
    map-only scoring scan → per-query top-k window) but the score column is
    a deterministic BIGINT, so results are value-comparable across engines,
    not just rank-comparable.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(q_col).alias("query_q")
        )
    )
    scored = (
        collection.select(F.col(id_col).alias("neighbor_id"), F.col(q_col))
        .join(q, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            int_dot(F.col("query_q"), F.col(q_col)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "knn_rank", "score")
    )
