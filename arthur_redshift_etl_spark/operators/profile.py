"""Data profiling: per-column stats in ONE table scan.

The reference validates schemas and constraints but never profiles data
content (SURVEY §2.11); warehouse migrations need it.  This computes, for
every requested column, (rows, nulls, exact distincts, min, max) in a
single aggregate pass — the per-column metrics are computed side by side
and unpivoted with ``stack``, so the table is scanned once regardless of
column count.  Multiple exact COUNT(DISTINCT) in one aggregate lower to a
Catalyst Expand (one row per distinct-column per input row): cost is
O(cols × rows) exchanged but still one scan and fully partial-aggregated.
At 100 TB swap ``exact=False`` for approx_count_distinct — same shape, no
Expand.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: List[str], exact: bool = True) -> DataFrame:
    """One-pass per-column profile: (column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max rendered as strings so
    heterogeneous column types stack into one result."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)).alias(
                f"__nd_{c}"
            )
        )
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
