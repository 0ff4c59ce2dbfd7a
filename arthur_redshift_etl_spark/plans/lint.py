"""EXPLAIN lint: warn about plan shapes that hurt at scale.

Reference parity: ``python/etl/explain.py:22-107`` — prints plans and warns
on bad Redshift distribution choices (DS_DIST_INNER / DS_BCAST_INNER /
DS_DIST_BOTH) and leader-node-only functions.  The Spark analogs:

| Redshift warning        | Spark analog                                    |
|-------------------------|-------------------------------------------------|
| DS_DIST_BOTH            | SortMergeJoin with both sides shuffled          |
| DS_BCAST_INNER (large)  | BroadcastNestedLoopJoin / CartesianProduct      |
| missing dist key        | Exchange hashpartitioning on every join input   |
| leader-only functions   | non-codegen Python UDF stages (BatchEvalPython) |
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from pyspark.sql import DataFrame


@dataclass
class LintWarning:
    code: str
    message: str

    def __str__(self) -> str:
        return f"[{self.code}] {self.message}"


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def lint_plan(df: DataFrame, broadcast_row_hint: int = 10_000_000) -> List[LintWarning]:
    """Inspect the physical plan for scale hazards."""
    text = plan_text(df)
    warnings: List[LintWarning] = []

    if "CartesianProduct" in text:
        warnings.append(
            LintWarning(
                "CARTESIAN",
                "cartesian product in plan — unbounded pair blowup at scale; "
                "add a join condition or block the join",
            )
        )
    if "BroadcastNestedLoopJoin" in text:
        warnings.append(
            LintWarning(
                "NL_JOIN",
                "broadcast nested-loop join — non-equi join semantics; verify "
                "the broadcast side stays small at production scale",
            )
        )
    n_smj = text.count("SortMergeJoin")
    if n_smj:
        warnings.append(
            LintWarning(
                "SMJ",
                f"{n_smj} sort-merge join(s) — fine for fact-fact joins, but "
                "broadcast any dimension side (AQE converts when stats allow)",
            )
        )
    n_exchange = len(re.findall(r"Exchange hashpartitioning", text))
    if n_exchange >= 4:
        warnings.append(
            LintWarning(
                "SHUFFLES",
                f"{n_exchange} hash exchanges — consider pre-partitioning/"
                "bucketing inputs on the dominant join key to reuse one shuffle",
            )
        )
    if "BatchEvalPython" in text:
        warnings.append(
            LintWarning(
                "PY_UDF",
                "row-at-a-time Python UDF in plan — rewrite with built-ins or "
                "an Arrow-batched pandas UDF (10-100x)",
            )
        )
    if (
        "InMemoryTableScan" not in text
        and "WholeStageCodegen" not in text
        # pre-execution AQE plans don't show codegen spans yet
        and "AdaptiveSparkPlan" not in text
    ):
        warnings.append(
            LintWarning("NO_CODEGEN", "no whole-stage codegen spans in plan")
        )
    return warnings


def scan_pushdown_report(df: DataFrame) -> List[str]:
    """PushedFilters/ReadSchema lines — verify pruning reached the scan."""
    text = plan_text(df)
    return [
        line.strip()
        for line in text.splitlines()
        if "PushedFilters" in line or "ReadSchema" in line
    ]
