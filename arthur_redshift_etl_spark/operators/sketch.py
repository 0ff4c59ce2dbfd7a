"""Mergeable distinct-count sketch (HyperLogLog) in exact integer arithmetic.

``approx_count_distinct`` already gives Spark a native HLL++, but its
register state is opaque — you cannot persist per-partition sketches, merge
them across days, or compare them against another engine.  This module
implements the classic HLL (Flajolet et al. 2007) with:

- an **engine-portable hash**: ``md5`` hex → register index (first byte)
  and a 32-bit value (next 8 hex digits), reproducible in any SQL engine;
- **exact integer register state**: the register table is ``(register,
  max_rho)``; the indicator sum Σ 2^-rho is carried scaled by 2^33 as a
  BIGINT (max term 2^33, ≤ m terms → far below 2^63), so partial sketches
  merge associatively with plain ``MAX`` / the estimate is derived from an
  exact integer in ONE double division — bit-identical across engines and
  partitionings (no float accumulation order anywhere);
- the standard bias-corrected estimator ``α_m · m² / Σ 2^-rho`` with
  linear counting below the 2.5·m small-range threshold (also one
  division: ``m · ln(m / empty)``).

This is the 100 TB pattern for distinct users/urls/documents per slice:
``registers()`` is a partial-aggregatable groupBy (map-side combine takes
the per-partition MAX), the register table is m rows (m = 256 here) no
matter the input size, daily sketches UNION + re-MAX to any window, and
only the m-row table ever moves.

No reference analog (Redshift's APPROXIMATE COUNT DISTINCT is a black
box); built from the public HLL paper.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

M_BITS = 8
M = 1 << M_BITS  # 256 registers
HASH_BITS = 32
# α_256 = 0.7213 / (1 + 1.079/256); literal kept to full double precision so
# the SQL oracle can repeat the exact same constant.
ALPHA_M = 0.7213 / (1.0 + 1.079 / 256.0)


def _register(h: Column) -> Column:
    """First md5 byte → register index in [0, 256)."""
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def _rho(h: Column) -> Column:
    """Leading-zero rank of the 32-bit value in md5 hex digits 3..10.

    rho = (number of leading zeros in the 32-bit value) + 1 = 33 -
    bit_length(v), with the all-zero value pinned to 33.  ``bin()`` gives
    bit_length without float log2 (whose edge behavior differs per libm).
    """
    v = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    return F.when(v == 0, F.lit(33)).otherwise(33 - F.length(F.bin(v))).cast("int")


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """The sketch state: (register, max_rho), ≤ 256 rows for any input.

    One partial-aggregatable shuffle; two sketches over disjoint (or
    overlapping!) inputs merge by UNION ALL + groupBy register + MAX.
    """
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.select(_register(h).alias("register"), _rho(h).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Collapse a register table to one row: exact integer indicator sum +
    the HLL estimate (raw, and small-range linear counting when applicable).

    ``int_sum`` = Σ_used 2^(33-max_rho) + empty·2^33 — the indicator sum
    scaled by 2^33, exact.  The only float ops are one division (raw) and
    one log (linear counting), each applied once to exact integers.
    """
    agg = registers.agg(
        F.count(F.lit(1)).alias("m_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - max_rho)")).alias("used_sum"),
    )
    empty = F.lit(M) - F.col("m_used")
    sums = agg.select(
        F.lit(M).alias("m"),
        F.col("m_used"),
        (F.col("used_sum") + empty.cast("long") * F.lit(1 << 33)).alias("int_sum"),
        empty.alias("m_empty"),
    )
    raw = F.lit(ALPHA_M * M * M * float(1 << 33)) / F.col("int_sum")
    linear = F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("m_empty").cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (F.col("m_empty") > 0), linear
    ).otherwise(raw)
    return sums.select("m", "m_used", "int_sum", est.alias("hll_estimate"))


def hll_error_bound() -> float:
    """Standard error of the m=256 sketch: 1.04/√m ≈ 6.5%."""
    return 1.04 / math.sqrt(M)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — heavy-hitter prefilter
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256  # one md5 byte per row hash — engine-portable like HLL above


def _cms_col(key: Column, row: int) -> Column:
    """Row-``row`` bucket: xxhash64 with the row index as seed.

    Unlike the HLL above, the sketch never leaves the engine (only the
    final EXACT heavy-hitter counts are oracle-compared), so the hash can
    be the JVM-intrinsic xxhash64 instead of engine-portable md5 — ~10×
    cheaper per row, which matters when every input row is hashed
    DEPTH times.
    """
    return F.pmod(F.xxhash64(F.lit(row), key.cast("string")), F.lit(CMS_WIDTH)).cast(
        "int"
    )


def cms_table(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch: (row, col, cnt), ≤ DEPTH·WIDTH rows for ANY input.

    Each input row contributes one increment per sketch row; the groupBy is
    partial-aggregatable, so every task emits at most DEPTH·WIDTH combined
    rows no matter how many billions of keys it scanned — this bounded
    state is the whole point vs an exact per-key groupBy.  Sketches over
    different batches merge by UNION ALL + groupBy + SUM (counters are
    additive); estimates only ever overestimate (no deletions).

    ``key_col`` may be a column name or a Column expression (e.g. the
    (group, key) composite used by :func:`heavy_hitters_per_group_exact`).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_col(key, i).alias("col")
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.row", "p.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_col(sketch_flat: list, key: Column) -> Column:
    """Point-estimate expression: min over rows of cnt[row][col(key)].

    ``sketch_flat`` is the DEPTH·WIDTH counter table collected to the
    driver (row-major, missing cells = 0) — bounded metadata like a
    centroid set, NOT data — embedded as an array literal so the lookup is
    a map-only JVM expression (no shuffle, no Python).
    """
    arr = F.lit(sketch_flat)
    return F.least(
        *[
            F.element_at(arr, _cms_col(key, i) + i * CMS_WIDTH + 1)
            for i in range(CMS_DEPTH)
        ]
    )


def collect_cms(sketch: DataFrame) -> list:
    """Flatten a cms_table result to the row-major literal used above."""
    flat = [0] * (CMS_DEPTH * CMS_WIDTH)
    for r in sketch.collect():
        flat[r["row"] * CMS_WIDTH + r["col"]] = r["cnt"]
    return flat


def heavy_hitters_exact(
    df: DataFrame, key_col: str, threshold: int
) -> DataFrame:
    """Exact keys with frequency ≥ threshold, CMS-prefiltered.

    Two passes, same shape as the GEMM-kNN rescore pattern:

    1. build the bounded sketch and broadcast it back as a literal — the
       per-row estimate is then a map-only expression;
    2. keep only rows whose ESTIMATE ≥ threshold (CMS never underestimates,
       so no true heavy hitter is dropped — one-sided error), and run the
       exact groupBy ONLY on that survivor set, re-filtering on the exact
       count to kill the false positives.

    At 100 TB the exact groupBy over all keys shuffles billions of groups;
    here the wide shuffle sees only candidate rows (skew-free: heavy keys
    are exactly the ones we keep, but their group count is tiny).  Output:
    (key, cnt) — identical to the naive GROUP BY ... HAVING.
    """
    flat = collect_cms(cms_table(df, key_col))
    key = F.col(key_col)
    est = cms_estimate_col(flat, key)
    return (
        df.filter(est >= F.lit(threshold))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_cols: list
) -> DataFrame:
    """Per-group sketch state: (group..., register, max_rho).

    Same algebra as :func:`hll_registers` with the group key carried
    through — ≤ 256 rows PER GROUP regardless of input size, still
    partial-aggregatable, still MAX-mergeable across batches.
    """
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            _register(h).alias("register"),
            _rho(h).alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_grouped(registers: DataFrame, group_cols: list) -> DataFrame:
    """Collapse per-group register tables to one estimate row per group.

    Identical arithmetic to :func:`hll_estimate` (exact scaled-integer
    indicator sum, one double division, linear counting under 2.5·m) —
    applied per group in ONE aggregation, so estimating distincts for a
    million daily/source slices costs a single shuffle on the group key.
    """
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("m_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - max_rho)")).alias("used_sum"),
    )
    empty = F.lit(M) - F.col("m_used")
    sums = agg.select(
        *[F.col(c) for c in group_cols],
        F.lit(M).alias("m"),
        F.col("m_used"),
        (F.col("used_sum") + empty.cast("long") * F.lit(1 << 33)).alias("int_sum"),
        empty.alias("m_empty"),
    )
    raw = F.lit(ALPHA_M * M * M * float(1 << 33)) / F.col("int_sum")
    linear = F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("m_empty").cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (F.col("m_empty") > 0), linear
    ).otherwise(raw)
    return sums.select(
        *group_cols, "m", "m_used", "int_sum", est.alias("hll_estimate")
    )


def heavy_hitters_per_group_exact(
    df: DataFrame,
    key_col: str,
    group_col: str,
    threshold: int,
    prefilter: str = "composite",
) -> DataFrame:
    """Exact (group, key) pairs where the key's IN-GROUP frequency ≥
    threshold, CMS-prefiltered; output identical to the naive
    GROUP BY group, key HAVING count >= threshold.

    ``prefilter`` selects the sketch (both one-sided: no true heavy pair
    is ever dropped; the exact recount kills false positives):

    - ``"composite"`` (default) — sketch the ``(group, key)`` COMPOSITE.
      This is the distributed form of "per-group sketches" with NO state
      multiplication: still one DEPTH×WIDTH counter table, but each
      (group, key) pair is estimated separately, so the bound tracks the
      pair's own count.  Pruning power is therefore INDEPENDENT of group
      count — the regime that defeats the global sketch (a key globally
      heavy but locally light in every group) prunes perfectly here.
      Collision noise is the same for both sketches (N increments over
      the same WIDTH columns), so the composite bound is stochastically
      tighter whenever keys span >1 group and identical at one group —
      measured falloff table in SCALE.md ("groups axis").
    - ``"global"`` — sketch the key alone; the estimate upper-bounds every
      per-group count (counts only add across groups).  Strictly weaker
      pruning, but the sketch is REUSABLE for the global
      :func:`heavy_hitters_exact` question over the same scan — pick it
      when both questions are asked of one pass.
    """
    if prefilter not in ("composite", "global"):
        raise ValueError(f"unknown prefilter: {prefilter!r}")
    key = F.col(key_col)
    if prefilter == "composite":
        # \x1f separator: unambiguous (group, key) framing for string casts
        sk_col = F.concat_ws(
            "\x1f", F.col(group_col).cast("string"), key.cast("string")
        )
    else:
        sk_col = key
    flat = collect_cms(cms_table(df, sk_col))
    est = cms_estimate_col(flat, sk_col)
    return (
        df.filter(est >= F.lit(threshold))
        .groupBy(group_col, key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


# ---------------------------------------------------------------------------
# Bloom filter — the membership sketch (HLL counts distinct, CMS counts
# frequency, KLL ranks; Bloom answers "possibly seen?" with ZERO false
# negatives).  Engine-portable md5 positions (like HLL's register hash, and
# unlike CMS's xxhash64) because the FPR-check entry's ORACLE must reproduce
# the exact bit positions in DuckDB.
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 4


def bloom_pos(key: Column, i: int, bits: int = BLOOM_BITS) -> Column:
    """Bit position of hash ``i`` for a key: md5 of 'i:key', 60-bit prefix,
    mod ``bits``.  SQL twin:
    ``('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
    1, 15))::BIGINT % bits``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % F.lit(bits)
    )


def bloom_bits(
    df: DataFrame,
    key_col: str,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build the filter: DataFrame of DISTINCT set bit positions (pos).

    ≤ BLOOM_BITS rows for ANY input — the same bounded-state property as
    the other sketches; each task's partial distinct emits at most
    BLOOM_BITS rows no matter how many keys it scanned.  Filters over
    different batches merge by UNION ALL + distinct (set union of bits),
    and the merged filter answers for the union of key sets — no
    deletions, like CMS.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pos = F.array(*[bloom_pos(key, i, bits) for i in range(hashes)])
    return df.select(F.explode(pos).alias("pos")).distinct()


def bloom_not_member(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Rows of ``probes`` that are DEFINITELY not members (≥1 unset bit).

    The complement (probes minus this) is the "possibly member" set, whose
    non-member share is the measured FPR.  ``bits`` is ≤ BLOOM_BITS rows —
    broadcast, so the check is a map-side anti-join per position.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    ppos = probes.select(
        key.alias("__k"),
        F.explode(
            F.array(*[bloom_pos(key, i, n_bits) for i in range(hashes)])
        ).alias("pos"),
    ).distinct()
    missing = ppos.join(F.broadcast(bits), "pos", "left_anti")
    return missing.select(F.col("__k").alias(key_col if isinstance(key_col, str) else "key")).distinct()
