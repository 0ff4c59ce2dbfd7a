"""Table reconciliation: keyed symmetric diff between two relations.

The warehouse counterpart of the reference's unload/reload round-trip check
(validate.py:266-324 in harrystech/arthur-redshift-etl, which compares only
column lists): compare CONTENT between two versions of a relation — e.g.
production vs staging before a blue-green publish, or a rebuilt table vs
yesterday's — and report which keys were added, removed, or changed.

Scale notes: one sort-merge join co-partitioned on the key (both sides
shuffle once on the same key, so AQE can pick a skew-aware plan); value
comparison is null-safe per column and stays in whole-stage codegen.  The
output is proportional to the DRIFT, not the table, so collecting or
unloading the diff is safe even when the inputs are 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keyed diff of ``a`` (old) vs ``b`` (new) → (*keys, diff_kind).

    ``diff_kind`` ∈ {'removed', 'added', 'changed'}; unchanged rows are not
    emitted.  Non-key columns are compared null-safe (NULL == NULL), so a
    value flipping to/from NULL counts as 'changed'.
    """
    cols = compare_cols or [c for c in a.columns if c not in keys]
    left = a.select(*keys, F.lit(True).alias("_in_a"),
                    *[F.col(c).alias(f"_a_{c}") for c in cols])
    right = b.select(*keys, F.lit(True).alias("_in_b"),
                     *[F.col(c).alias(f"_b_{c}") for c in cols])
    joined = left.join(right, list(keys), "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    kind = (
        F.when(F.col("_in_b").isNull(), "removed")
        .when(F.col("_in_a").isNull(), "added")
        .when(~same, "changed")
    )
    return (
        joined.withColumn("diff_kind", kind)
        .filter(F.col("diff_kind").isNotNull())
        .select(*keys, "diff_kind")
    )
