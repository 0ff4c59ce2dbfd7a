"""PII detection and redaction over document tables.

A training-data pipeline has to find and scrub personally-identifiable
information before corpus release.  Everything here is built-in regex
(JVM-side ``regexp_count`` / ``regexp_replace``) — no Python in the hot
path, so the scan is a map-only pass over the corpus that scales with
input bytes and never shuffles.

Pattern set: the classic structured-PII families (email, IPv4, US-style
phone, SSN).  The regexes are RE2-compatible (no backreferences or
lookahead) so the same pattern text runs on Spark (Java regex), DuckDB
(RE2) and most other engines — which is what makes the oracle parity
checks possible.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: email before phone so the digits inside a
# local-part are consumed as part of the email match, not re-matched later.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(
    df: DataFrame, text_col: str = "text", kinds: Optional[Sequence[str]] = None
) -> DataFrame:
    """Per-row match counts for each PII family (map-only, no shuffle)."""
    kinds = list(kinds or PII_PATTERNS)
    cols = [
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k])).cast("long").alias(
            f"n_{k}"
        )
        for k in kinds
    ]
    total = sum(
        (F.col(f"n_{k}") for k in kinds[1:]), F.col(f"n_{kinds[0]}")
    ).alias("n_pii")
    return df.select("*", *cols).select("*", total)


def redact(
    df: DataFrame,
    text_col: str = "text",
    replacement_fmt: str = "[{kind}]",
    kinds: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Replace every PII match with a typed placeholder like ``[EMAIL]``.

    Single projection chaining one regexp_replace per family — Catalyst
    fuses them into one codegen stage; the corpus is scanned once.
    """
    col: Column = F.col(text_col)
    for kind in kinds or PII_PATTERNS:
        col = F.regexp_replace(
            col, PII_PATTERNS[kind], replacement_fmt.format(kind=kind.upper())
        )
    return df.withColumn(out_col or text_col, col)


def quarantine_split(
    df: DataFrame, text_col: str = "text", max_pii: int = 0
):
    """(clean_df, flagged_df) — rows whose PII count exceeds the budget go to
    the quarantine side for manual review instead of silent redaction."""
    counted = pii_counts(df, text_col)
    clean = counted.filter(F.col("n_pii") <= max_pii).drop(
        *[c for c in counted.columns if c.startswith("n_")]
    )
    flagged = counted.filter(F.col("n_pii") > max_pii)
    return clean, flagged


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier equivalence classes smaller than ``k``.

    The standard re-identification audit: any combination of
    quasi-identifier values shared by fewer than k rows singles those rows
    out.  One partial-aggregatable groupBy over the QI tuple; output is
    the violating classes with their sizes (empty result == k-anonymous).
    Run before publishing any dataset carrying demographic columns — the
    release gate that complements the pattern-based PII scrubbers above.
    """
    return (
        df.groupBy(*[F.col(c) for c in quasi_identifiers])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )


def forget_rows(
    df: DataFrame, requests: DataFrame, key_col: str
) -> "tuple[DataFrame, DataFrame]":
    """Right-to-be-forgotten: remove all rows for requested keys, with audit.

    Returns ``(scrubbed, audit)``: the scrubbed frame is a broadcast
    LEFT ANTI join (deletion lists are request-sized, not corpus-sized —
    map-only against the fact table), and the audit is a one-row frame
    (rows_before, rows_removed, rows_after, residual_matches) where
    ``residual_matches`` re-checks the scrubbed output against the request
    list — a publish gate must see 0 there, computed from the actual
    output, not inferred.  At 100 TB this is the rewrite step of a
    delete-then-reload (loader.py staged swap); the operator owns the
    semantics, the loader owns atomicity.
    """
    keys = requests.select(key_col).distinct()
    scrubbed = df.join(F.broadcast(keys), key_col, "left_anti")
    # One scan for before+removed: broadcast-left-join a request marker and
    # count both in the same aggregation (separate agg jobs would scan the
    # 100 TB fact table once per number).  The residual check is a second,
    # unavoidable scan — it is the evidence, computed from the ACTUAL
    # scrubbed output, not inferred from the arithmetic.
    marker = keys.withColumn("__requested", F.lit(1))
    before_removed = (
        df.join(F.broadcast(marker), key_col, "left")
        .agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.count("__requested").alias("rows_removed"),
        )
    )
    residual = scrubbed.join(F.broadcast(keys), key_col, "left_semi").agg(
        F.count(F.lit(1)).alias("residual_matches")
    )
    audit = before_removed.crossJoin(F.broadcast(residual)).select(
        "rows_before",
        "rows_removed",
        (F.col("rows_before") - F.col("rows_removed")).alias("rows_after"),
        "residual_matches",
    )
    return scrubbed, audit
