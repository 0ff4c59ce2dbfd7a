"""Iterative clustering over embedding columns (Lloyd's k-means, cosine).

The genuinely-iterative operator class: each round is a full DataFrame
pass (assign → element-wise mean), driver-side loop only over ITERATIONS
(a handful), never over rows.  Centroid recomputation is a posexplode +
two-level aggregation — scales as one shuffle keyed by (centroid, dim) per
iteration.

Not SQL-oracle-expressible (iteration count changes the fixpoint), so the
workload entry is a rows-only check; the pytest asserts invariants
(partition of the collection, nonempty clusters, improving inertia).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_array, dot, ivf_assign


def recompute_centroids(
    collection: DataFrame, assignment: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean per cluster: (centroid_id, embedding)."""
    joined = collection.join(assignment, id_col).select(
        "centroid_id", F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x")
    )
    dim_means = joined.groupBy("centroid_id", "pos").agg(F.avg("x").alias("m"))
    return (
        dim_means.groupBy("centroid_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("pairs")
        )
        .select(
            "centroid_id",
            F.transform(F.col("pairs"), lambda p: p.getField("m")).alias(vec_col),
        )
    )


def kmeans(
    collection: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Tuple[DataFrame, DataFrame]:
    """Cosine k-means seeded by the first k vectors (deterministic).

    Returns (assignment, centroids).  Each iteration materializes the small
    centroid table (k rows) on the driver via the broadcast in ivf_assign —
    the collection itself is never collected.
    """
    centroids = collection.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    assignment = None
    for _ in range(iterations):
        assignment = ivf_assign(collection, centroids, id_col, vec_col)
        centroids = recompute_centroids(collection, assignment, id_col, vec_col)
    return assignment, centroids
