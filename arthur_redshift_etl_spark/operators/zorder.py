"""Z-order (Morton) clustering for multi-column data skipping.

Parquet footers carry per-file/rowgroup min-max stats; sorting by one key
gives perfect skipping on that key and none on others.  Interleaving the
bits of two keys (Morton order) keeps files tight in BOTH dimensions, so
predicates on either column prune files — the standard lakehouse layout
technique (Delta/Iceberg ``OPTIMIZE ZORDER BY``), here as a plain-Spark
expression + range-partitioned write.

Everything is built-in bit arithmetic (shiftright/&/shiftleft summed), so
the key computation is whole-stage-codegen'd — no UDF.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, min_val: Column, max_val: Column, bits: int) -> Column:
    """Map a numeric column to an integer in [0, 2^bits)."""
    span = (max_val - min_val).cast("double")
    unit = (col.cast("double") - min_val.cast("double")) / F.when(
        span == 0, F.lit(1.0)
    ).otherwise(span)
    return F.least(
        F.floor(unit * F.lit((1 << bits) - 1)).cast("long"), F.lit((1 << bits) - 1)
    )


def morton_interleave(a: Column, b: Column, bits: int = 21) -> Column:
    """Interleave the low ``bits`` of two non-negative longs: a→even bit
    positions, b→odd.  2×21 bits fits a signed 64-bit long."""
    parts: List[Column] = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def with_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 21, key_col: str = "__zorder"
) -> DataFrame:
    """Append a Morton key over two numeric columns, normalized by the
    columns' actual min/max (one tiny pre-aggregate, broadcast back)."""
    if len(cols) != 2:
        raise ValueError("z-order here interleaves exactly 2 columns")
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    a = _normalize(
        F.col(cols[0]), F.col(f"__min_{cols[0]}"), F.col(f"__max_{cols[0]}"), bits
    )
    b = _normalize(
        F.col(cols[1]), F.col(f"__min_{cols[1]}"), F.col(f"__max_{cols[1]}"), bits
    )
    return joined.withColumn(key_col, morton_interleave(a, b, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
    options: dict | None = None,
) -> None:
    """Cluster rows by Morton key and write: range partition on the key
    (files own contiguous z-ranges) + sort within partitions (tight
    rowgroup stats).  Readers filtering on EITHER column skip files via
    parquet min-max.  ``options`` passes writer options through (e.g.
    ``parquet.block.size`` to shrink row groups so min-max pruning has
    finer granularity — the skipping unit is the row group)."""
    keyed = with_zorder_key(df, cols)
    writer = (
        keyed.repartitionByRange(num_files, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)
