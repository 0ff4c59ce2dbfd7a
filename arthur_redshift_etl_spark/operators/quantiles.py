"""Exact distributed NTILE / quantile bucketing without a single-task window.

Reference parity: Redshift exposes ``NTILE(k) OVER (ORDER BY ...)`` to
transform SQL (any ``.sql`` design file may use it — e.g. the reference's
transform surface, ``python/etl/load.py`` materializes arbitrary SELECTs).
Spark's ``ntile`` over a partition-less window funnels the whole input
through one task — the textbook scale-killer at 100 TB.

``ntile_exact`` reproduces NTILE's *exact* semantics (front-loaded buckets:
with n rows and k buckets the first ``n mod k`` buckets get ``ceil(n/k)``
rows, the rest ``floor(n/k)``) from a distributed global row number
(:func:`..operators.identity.global_row_number`: range-repartition + local
rank + metadata-only prefix sum).  The bucket is then a pure per-row integer
expression — no global window anywhere in the plan.

Why not approx_percentile cutpoints?  Cutpoints on the order column alone
cannot split ties at bucket boundaries the way NTILE's rank-based contract
requires (two rows with equal values can land in different buckets), so the
result would only approximate NTILE.  The two-phase rank is just as parallel
(one range shuffle + one map-only count pass) and is exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .identity import global_row_number


def ntile_exact(
    df: DataFrame,
    num_buckets: int,
    order_by: Sequence[str],
    bucket_column: str = "bucket",
) -> DataFrame:
    """NTILE(num_buckets) OVER (ORDER BY order_by) — fully distributed, exact.

    ``order_by`` should be a total order (add a unique tiebreaker column) for
    run-to-run determinism, same as any window rank.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    ranked, total = global_row_number(df, order_by, row_number_column="__grn")
    if total == 0:
        return ranked.withColumn(bucket_column, F.lit(None).cast("int")).drop("__grn")
    q, r = divmod(total, num_buckets)
    if q == 0:
        # fewer rows than buckets: NTILE gives each row its own bucket == rank
        bucket = F.col("__grn")
    else:
        # integer `div` (not double /): double division can be off by one at
        # exact bucket boundaries once row numbers exceed 2^53 / k precision
        head = r * (q + 1)  # rows covered by the ceil-sized leading buckets
        bucket = F.when(
            F.col("__grn") <= F.lit(head),
            F.expr(f"(__grn - 1) div {q + 1}") + 1,
        ).otherwise(F.lit(r) + F.expr(f"(__grn - {head} - 1) div {q}") + 1)
    return ranked.withColumn(bucket_column, bucket.cast("int")).drop("__grn")
