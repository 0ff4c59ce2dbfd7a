"""Range joins and time-series gap-filling.

Spark has no native range-join optimization (a raw theta join on
``a.ts BETWEEN b.lo AND b.hi`` becomes a nested-loop/cartesian).  The scale
pattern is **bucketed range join**: quantize both sides to fixed-width time
buckets, equi-join on the bucket (plus neighbor buckets wide enough to cover
the range), then apply the exact range predicate.  The shuffle is keyed by
bucket — pair blowup is bounded by per-bucket occupancy, never n².

Gap-filling materializes missing buckets with ``sequence`` + explode — a
metadata-sized generator join, no driver loop.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    extra_keys: Optional[List[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| ≤ max_gap_seconds,
    optionally also matching on ``extra_keys`` (e.g. user_id).

    Both sides get a bucket of width ``max_gap_seconds``; a right row can
    only match left rows in its own or adjacent buckets, so the right side
    is exploded to 3 bucket keys and the join is a plain equi-join on
    (extra_keys…, bucket) followed by the exact predicate.

    The gap predicate compares MICROSECONDS (``unix_micros``), not
    truncated whole seconds: second-truncation made boundary pairs
    engine-dependent (one engine floors fractional seconds, another
    rounds — a pair at exactly the gap limit then flips in or out).
    Integer microseconds are exact in every engine.
    """
    extra_keys = list(extra_keys or [])
    width_us = F.lit(max_gap_seconds * 1_000_000)
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = (l_us / width_us).cast("long")
    rb = (r_us / width_us).cast("long")

    l = left.withColumn("__bucket", lb)
    r = right.withColumn(
        "__bucket", F.explode(F.array(rb - 1, rb, rb + 1))
    )
    joined = l.join(r, extra_keys + ["__bucket"], how)
    exact = F.abs(
        F.unix_micros(F.col(left_ts).cast("timestamp"))
        - F.unix_micros(F.col(right_ts).cast("timestamp"))
    ) <= width_us
    return joined.filter(exact).drop("__bucket")


def gapfill_time_buckets(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    group_cols: Optional[List[str]] = None,
    agg_exprs: Optional[list] = None,
) -> DataFrame:
    """Aggregate into fixed buckets, then fill empty buckets with zeros.

    The bucket spine is ``sequence(min, max, step)`` exploded once per group
    — generated distributed, never collected.  Missing buckets appear with
    count 0 / null aggregates coalesced by the caller's agg aliases.
    """
    group_cols = list(group_cols or [])
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds).cast("long")
        * bucket_seconds
    ).cast("timestamp_ntz")
    aggregated = (
        df.withColumn("__bucket", bucket)
        .groupBy(*(group_cols + ["__bucket"]))
        .agg(*(agg_exprs or [F.count(F.lit(1)).alias("n")]))
    )
    bounds = df.select(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    groups = df.select(*group_cols).distinct() if group_cols else None
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"),
                F.col("hi"),
                F.expr(f"INTERVAL {bucket_seconds} SECOND"),
            )
        ).alias("__bucket")
    )
    if groups is not None:
        spine = spine.crossJoin(F.broadcast(groups))
    filled = spine.join(aggregated, ["__bucket"] + group_cols, "left_outer")
    return filled.withColumnRenamed("__bucket", "bucket_ts")
