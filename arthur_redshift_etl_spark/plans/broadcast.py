"""Shared decoded-bytes broadcast budget — one gate for every hinted broadcast.

Why decoded bytes, not Catalyst's stat bytes: Spark's own auto-broadcast gate
tests the COMPRESSED columnar size estimate against
``autoBroadcastJoinThreshold``, but what the driver materializes and every
executor holds is the DECODED ``UnsafeHashedRelation`` — measured
(scripts/broadcast_crossover.py, SCALE.md round 7) at ~10-20x the stat bytes;
a 1.5M-row dim printing 2.0 MB of parquet stats joined 1.7x SLOWER broadcast
than sort-merge because the in-memory hashmap was ~40 MB.  The measured
crossover on a 6M-row fact sits at ~500k dim rows / ~20 MiB decoded — that is
the default budget here.

Reference parity: the reference warns on Redshift's DS_BCAST_INNER when the
inner table is large (``python/etl/explain.py:22-107``); this is the Spark
analog with a measured threshold instead of Redshift's planner heuristics.

Two call shapes:

- :func:`broadcast_within_budget` — the drop-in for ``F.broadcast(df)`` at
  scale-sensitive sites: the caller supplies a MEASURED row count (every site
  that needs this already has one — an aggregate output it counted, a
  persisted table's count) and the helper returns the hinted DataFrame only
  when rows x decoded row width fits the budget, else the unhinted one so the
  join shuffles (and AQE may still re-decide from true runtime stats, which
  is the self-correcting path).
- :func:`decoded_row_width` / :func:`estimated_decoded_bytes` — the size
  model alone, for sites with bespoke fallbacks (pagerank's shuffle-join
  iteration, dedup's measured-path tiers) and for the plan lint's
  BIG_DECODED_BROADCAST check.

The width model is deliberately conservative-simple: fixed physical widths
for numeric/temporal types, flat allowances for strings/binaries, and a
per-row hashmap overhead (UnsafeRow header + LongToUnsafeRowMap entry,
measured ~32 B/row on the pagerank node table).  Callers with better
knowledge (a known-dim embedding array, a measured avg string) pass
``row_width=`` and skip the model.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: rows x width above this stays a shuffle join — the measured crossover
#: (~500k x ~40 B rows) from scripts/broadcast_crossover.py.
DEFAULT_BROADCAST_BUDGET_BYTES = 20 << 20

#: UnsafeRow header + hashmap entry + object padding, measured on the
#: pagerank (long, double) node table (~32 B total/row, 16 of which is this).
PER_ROW_OVERHEAD_BYTES = 16

_FIXED_WIDTHS = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.DateType: 4,
    T.FloatType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
}

#: flat allowances for variable-width types when the caller has no better
#: number — sized for dimension-ish columns (names, keys, codes), NOT long
#: text: a site broadcasting document text should measure, not model.
STRING_WIDTH_BYTES = 48
BINARY_WIDTH_BYTES = 64
_VAR_ELEMS_ASSUMED = 32  # unknown-length array/map element count


def _type_width(dt: T.DataType) -> int:
    for t, w in _FIXED_WIDTHS.items():
        if isinstance(dt, t):
            return w
    if isinstance(dt, T.DecimalType):
        return 16
    if isinstance(dt, T.StringType):
        return STRING_WIDTH_BYTES
    if isinstance(dt, T.BinaryType):
        return BINARY_WIDTH_BYTES
    if isinstance(dt, T.ArrayType):
        return 16 + _VAR_ELEMS_ASSUMED * _type_width(dt.elementType)
    if isinstance(dt, T.MapType):
        return 16 + _VAR_ELEMS_ASSUMED * (
            _type_width(dt.keyType) + _type_width(dt.valueType)
        )
    if isinstance(dt, T.StructType):
        return 8 + sum(_type_width(f.dataType) for f in dt.fields)
    return 16  # unknown type: a word + pointer


def decoded_row_width(schema: T.StructType) -> int:
    """Estimated in-memory bytes per hashed-relation row for ``schema``."""
    return PER_ROW_OVERHEAD_BYTES + sum(_type_width(f.dataType) for f in schema.fields)


def estimated_decoded_bytes(
    rows: int, schema: Optional[T.StructType] = None, row_width: Optional[int] = None
) -> int:
    """rows x decoded row width; pass ``row_width`` to override the model."""
    if row_width is None:
        if schema is None:
            raise ValueError("need schema or row_width")
        row_width = decoded_row_width(schema)
    return int(rows) * int(row_width)


def fits_broadcast_budget(
    rows: int,
    schema: Optional[T.StructType] = None,
    row_width: Optional[int] = None,
    budget_bytes: int = DEFAULT_BROADCAST_BUDGET_BYTES,
) -> bool:
    return estimated_decoded_bytes(rows, schema, row_width) <= budget_bytes


def broadcast_within_budget(
    df: DataFrame,
    rows: int,
    row_width: Optional[int] = None,
    budget_bytes: int = DEFAULT_BROADCAST_BUDGET_BYTES,
) -> DataFrame:
    """``F.broadcast(df)`` iff the measured ``rows`` fit the decoded budget.

    Above the budget the UNHINTED frame is returned — the join plans as a
    shuffle join (identical results; AQE can still choose a broadcast later
    from true runtime stats, which is the size-safe direction: runtime stats
    can only shrink the estimate, a forced hint can only overcommit).
    """
    if fits_broadcast_budget(rows, df.schema, row_width, budget_bytes):
        return F.broadcast(df)
    return df
