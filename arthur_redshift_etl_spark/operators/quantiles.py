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


def ntile_exact_grouped(
    df: DataFrame,
    num_buckets: int,
    group_cols: Sequence[str],
    order_by: Sequence[str],
    bucket_column: str = "bucket",
) -> DataFrame:
    """NTILE(k) OVER (PARTITION BY group ORDER BY ...) — exact, skew-proof.

    The per-group counterpart of :func:`ntile_exact`, for per-domain score
    calibration (quality quartiles within each source so a verbose domain
    doesn't monopolize the top global bucket).  The naive window sorts an
    entire stratum in one task — the same 90%-mass-domain straggler the
    round-8 sampling fix killed — so the rank comes from
    :func:`..operators.identity.grouped_row_number` (range repartition +
    local rank + metadata prefix sum + budget-gated group-start join) and
    NTILE's front-loaded bucket contract (first ``n mod k`` buckets get
    ``ceil(n/k)`` rows) is then pure per-row integer arithmetic on the
    group-local rank and group size — per-group n, unlike the global
    version's driver-side divmod, so it rides the same row.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    from .identity import grouped_row_number

    ranked = grouped_row_number(
        df, group_cols, order_by, row_number_column="__grn_g",
        count_column="__n_g",
    )
    # one SQL expression, q/r spelled once (integer `div`, not double /:
    # boundary exactness, same reason as the global version).  NTILE's
    # front-loaded contract: with n = q*k + r, the first r buckets get
    # q+1 rows; fewer rows than buckets -> bucket == rank.
    qs = f"(__n_g div {num_buckets})"
    rs = f"(__n_g % {num_buckets})"
    bucket = F.expr(
        f"CASE WHEN {qs} = 0 THEN __grn_g"
        f" WHEN __grn_g <= {rs} * ({qs} + 1)"
        f" THEN (__grn_g - 1) div ({qs} + 1) + 1"
        f" ELSE {rs} + (__grn_g - {rs} * ({qs} + 1) - 1) div {qs} + 1 END"
    )
    return ranked.withColumn(bucket_column, bucket.cast("int")).drop(
        "__grn_g", "__n_g"
    )


# ---------------------------------------------------------------------------
# Mergeable single-pass quantile sketch (KLL-style, deterministic compaction)
# ---------------------------------------------------------------------------

def kll_partition_sketches(
    df: DataFrame, value_col: str, capacity: int = 256
) -> DataFrame:
    """One-pass per-partition quantile sketches: (value, weight) rows.

    The niche the exact two-phase quantiles (:func:`ntile_exact` /
    ``global_row_number``) do NOT cover: they pay a full range shuffle for
    exactness, while this is a MAP-ONLY pass whose output is bounded
    sketch state (≤ capacity · log2(n/capacity) rows per partition) that
    merges by plain UNION — the single-pass/mergeable trade, same family
    as the HLL/CMS sketches.

    Compaction is the KLL scheme (Karnin, Lang, Liberty 2016, FOCS) with
    DETERMINISTIC even-index keeps instead of coin flips: when a level's
    sorted buffer of weight-w items fills, every second item survives
    with weight 2w.  Determinism trades the unbiasedness proof for
    reproducibility — same input split → same sketch, bit for bit — and
    keeps the rank-error bound's shape: each compaction of a weight-w
    buffer perturbs any rank by ≤ w, so total rank error is
    O(n · log(n/capacity) / capacity) (empirically ~0.5% of n at
    capacity 256; property-tested against the exact ranks).
    """

    if capacity < 2 or capacity % 2:
        # odd capacities silently lose one unit of rank mass per compaction
        # (buf[1::2] keeps floor(c/2) of c items); capacity 1 discards
        # everything — reject instead of degrading
        raise ValueError(f"capacity must be an even integer >= 2, got {capacity}")

    def run(batches):
        import numpy as np
        import pandas as pd

        levels: list[list[float]] = [[]]  # level i holds weight-2^i items

        def compact(i: int) -> None:
            buf = sorted(levels[i])
            if i + 1 == len(levels):
                levels.append([])
            levels[i + 1].extend(buf[1::2])  # deterministic: keep odd idx
            levels[i] = []

        for pdf in batches:
            # NULLs arrive as NaN in the float64 Series ('v is None' would
            # be dead code and NaN breaks sorted()); drop them vectorized.
            arr = pdf[value_col].to_numpy(dtype="float64")
            arr = arr[~np.isnan(arr)]
            # slice-fill level 0 (hot path amortized over numpy slices);
            # compaction fires exactly at capacity, so the sketch is
            # bit-identical to per-item insertion
            pos = 0
            while pos < arr.shape[0]:
                take = capacity - len(levels[0])
                levels[0].extend(arr[pos : pos + take].tolist())
                pos += take
                i = 0
                while i < len(levels) and len(levels[i]) >= capacity:
                    compact(i)
                    i += 1
        out_v, out_w = [], []
        for i, buf in enumerate(levels):
            for v in buf:
                out_v.append(v)
                out_w.append(1 << i)
        yield pd.DataFrame({"value": out_v, "weight": out_w})

    return df.select(value_col).mapInPandas(run, "value double, weight long")


def kll_quantiles(
    sketches: DataFrame, probs: Sequence[float]
) -> "list[float]":
    """Estimate quantiles from (merged) sketch rows.

    The sketch table is bounded state (partitions · capacity · levels
    rows — metadata-scale, like a CMS counter table), so the weighted
    rank walk runs on the driver over the collected sketch, NOT the data.
    Sketches from different inputs/batches merge by UNION ALL first.
    An EMPTY sketch (no non-null input) yields ``None`` for every
    requested quantile — callers must handle the null, there is no
    numeric answer to invent.
    """
    rows = sorted(
        ((r["value"], r["weight"]) for r in sketches.collect()),
        key=lambda t: t[0],
    )
    total = sum(w for _, w in rows)
    out = []
    for p in probs:
        target = p * total
        acc = 0
        ans = rows[-1][0] if rows else None
        for v, w in rows:
            acc += w
            if acc >= target:
                ans = v
                break
        out.append(ans)
    return out


def kll_merge_rows(
    rows: "Sequence[tuple[float, int]]", capacity: int = 256
) -> "list[tuple[float, int]]":
    """Merge (value, weight) sketch rows into ONE compacted KLL sketch.

    The mergeability half of the KLL contract made explicit: items of
    weight 2^i re-enter the level structure at level i and compaction
    proceeds exactly as in :func:`kll_partition_sketches`, so a sketch
    table that grew by UNION (across partitions, batches, or days)
    collapses back to <= capacity * levels rows while each compaction of
    a weight-w buffer still perturbs any rank by <= w.  Deterministic:
    ingestion order is sorted (level, value), keeps are even-index.

    Weights must be powers of two — the only weights this sketch family
    ever emits; anything else means the rows are not ours.
    """
    if capacity < 2 or capacity % 2:
        raise ValueError(f"capacity must be an even integer >= 2, got {capacity}")
    items = []
    for v, w in rows:
        w = int(w)
        if w <= 0 or (w & (w - 1)) != 0:
            raise ValueError(f"sketch weight {w} is not a power of two")
        items.append((w.bit_length() - 1, float(v)))
    items.sort()
    levels: "list[list[float]]" = [[]]
    for lvl, v in items:
        while len(levels) <= lvl:
            levels.append([])
        levels[lvl].append(v)
        i = lvl
        while i < len(levels) and len(levels[i]) >= capacity:
            buf = sorted(levels[i])
            if i + 1 == len(levels):
                levels.append([])
            levels[i + 1].extend(buf[1::2])  # deterministic: keep odd idx
            levels[i] = []
            i += 1
    return [
        (v, 1 << i) for i, buf in enumerate(levels) for v in buf
    ]
