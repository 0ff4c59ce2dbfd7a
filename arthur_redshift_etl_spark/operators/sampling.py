"""Deterministic sampling and dataset-split operators.

Training-data pipelines need splits and samples that are (a) reproducible
across runs and engines, (b) computable without a global shuffle or a
driver-side random state.  Everything here keys off a multiplicative
integer hash of the row id — pure BIGINT arithmetic, so a SQL oracle
computes bit-identical assignments (no engine-specific rand()/hash()).

Reference parity: the reference's only sampling operator is the extract
sampling predicate ``("key" % 10) = 1`` (extract/database_extractor.py:38-40,
141-154 in harrystech/arthur-redshift-etl) — the same idea (deterministic,
pushdown-able arithmetic on a key), generalized here to bucketed splits and
per-group exact-fraction samples.

Scale notes:
- ``hash_bucket``/``split_assign`` are narrow (per-row projection, no
  shuffle); they survive any data size and push down to scans.
- ``stratified_sample_exact`` pays one RANGE shuffle over (stratum, rank
  key) plus a tiny group-start aggregate — skew-proof: a 90%-mass stratum
  spreads over many range partitions instead of funneling through one
  task (the old full-stratum window's failure mode).  ``split_assign``
  with a per-stratum threshold remains the shuffle-FREE alternative when
  an approximate fraction suffices.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.sql.window import Window

# Knuth's multiplicative constant (2^32 / phi); spreads consecutive ids
KNUTH = 2654435761
MOD = 1 << 32


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id.

    BIGINT-safe for ids < 2^31 (product < 2^63); identical arithmetic in
    any ANSI SQL engine: ``(id * 2654435761) % 4294967296 % buckets``.
    """
    return (id_col.cast("long") * F.lit(KNUTH)) % F.lit(MOD) % F.lit(buckets)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    valid: int = 10,
) -> DataFrame:
    """Add ``bucket`` and ``split`` (train/valid/test) columns.

    train/valid are percentage cut points; the remainder is test.
    Narrow transformation — no shuffle, safe at any scale.
    """
    bucket = hash_bucket(F.col(id_col))
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train, "train")
        .when(F.col("bucket") < train + valid, "valid")
        .otherwise("test"),
    )


def stratified_sample_exact(
    df: DataFrame,
    stratum_cols: Sequence[str],
    id_col: str = "doc_id",
    fraction: float = 0.2,
) -> DataFrame:
    """Exactly ⌈fraction·|stratum|⌉ rows per stratum, deterministically.

    Rows are ranked inside each stratum by (hash_bucket, id) — a stable
    pseudo-random order — and the top ⌈fraction·n⌉ are kept.

    The rank is :func:`..operators.identity.grouped_row_number` (range
    repartition + local rank + metadata prefix sum + group-start join),
    NOT a ``row_number() OVER (PARTITION BY stratum)`` window: the window
    sorts a whole stratum in one task, and real corpora are domain-skewed
    — a 90%-mass web-crawl stratum at 100 TB is a one-task straggler/OOM
    (measured: scripts/stratified_skew_ab.py).  Same answer for the same
    total order; the stratum never funnels through one task.
    """
    from .identity import grouped_row_number

    ranked = grouped_row_number(
        df.withColumn("_hb", hash_bucket(F.col(id_col))),
        stratum_cols,
        ["_hb", id_col],
        row_number_column="_rn",
        count_column="_n",
    )
    return ranked.filter(
        F.col("_rn") <= F.ceil(F.lit(fraction) * F.col("_n"))
    ).drop("_hb", "_rn", "_n")


def weighted_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    weight_cap: float,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: P(keep) ≈ weight/weight_cap.

    Importance sampling for training corpora (keep high-value rows more
    often) without ``rand()``: the keep decision compares the row's hash
    bucket, scaled to [0, 1), against the row's normalized weight.  Pure
    per-row arithmetic — no shuffle, pushes down to the scan, and the same
    rows are kept on every run and every engine (the SQL oracle reproduces
    it bit-for-bit).  Weights above ``weight_cap`` are always kept.
    """
    u = hash_bucket(F.col(id_col), buckets).cast("double") / F.lit(float(buckets))
    return df.filter(u * F.lit(float(weight_cap)) < F.col(weight_col))


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Exact top-k rows per group via two-phase (sharded) selection.

    A single ``row_number() OVER (PARTITION BY group ORDER BY ...)`` sorts
    EVERY row of a group in one task — with few, huge groups (e.g. top
    documents per source domain over a 100 TB corpus) that is a
    straggler/OOM point.  Instead:

    - phase 1 ranks within ``(group, input-partition)`` — each shard is at
      most one input partition's share of the group, so the sort is bounded
      by the partition size regardless of group skew — and keeps ≤ k rows
      per shard;
    - phase 2 ranks the ≤ k·shards survivors per group, which is
      driver-small per group (k ≤ hundreds, shards = cluster parallelism).

    Any row in the true top-k is in the top-k of its own shard, so the
    result is exactly the single-window answer.  The shard id comes from
    ``spark_partition_id()`` — run-dependent, but only the (deterministic)
    final ranking survives.  Adds ``rank_col`` = final 1-based rank; total
    order must be made unique by ``order_cols`` (include an id tiebreaker).
    """
    order = [F.col(c) for c in order_cols]
    w1 = Window.partitionBy(*group_cols, "_shard").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_shard", F.spark_partition_id())
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .drop("_shard", "_rk1")
    )


# hex-prefix cut points for percentage splits over md5(group): 4 hex chars
# = 65536 values; 0.8 * 65536 = 52428.8 -> 0xCCCD, 0.9 * 65536 = 58982.4
# -> 0xE667 (both rounded up, so the train/valid shares are within 0.002%
# of nominal).  Lexicographic compare of lowercase hex is engine-portable
# (Spark md5 and DuckDB md5 both emit lowercase hex strings).
GROUP_SPLIT_CUT_TRAIN = "cccd"
GROUP_SPLIT_CUT_VALID = "e667"


def grouped_split_assign(df: DataFrame, group_col: str) -> DataFrame:
    """Leakage-safe train/valid/test split: the WHOLE group (e.g. every
    document of one source/site/author) lands in one split.

    ``split_assign`` hashes the row id, so near-duplicate rows sharing a
    group can straddle train and eval — the classic contamination path.
    This variant hashes the group key (md5 hex prefix, portable across
    engines) so group membership decides the split: ~80/10/10 by GROUP
    WEIGHT (a heavy group tips the realized row shares — by design; the
    alternative is leakage).  Narrow transformation: per-row md5 + two
    string compares, no shuffle, pushes down to scans at any scale.
    """
    prefix = F.substring(F.md5(F.col(group_col).cast("string")), 1, 4)
    return df.withColumn(
        "split",
        F.when(prefix < GROUP_SPLIT_CUT_TRAIN, "train")
        .when(prefix < GROUP_SPLIT_CUT_VALID, "valid")
        .otherwise("test"),
    )
