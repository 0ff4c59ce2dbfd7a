"""Design validation against live queries: the transform dry-run.

Reference parity: ``python/etl/validate.py``:
- dry-run a transformation, diff actual vs declared columns (:124-239,
  difflib-based minimal-edit hints :242-263);
- actual vs declared dependency diff (via the logical plan here, instead of
  ``pg_depend``);
- ``WHERE FALSE`` permission/syntax probe (:327-336) → ``.limit(0)`` run.
"""

from __future__ import annotations

import difflib
import logging
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from pyspark.sql import SparkSession

from .functions.compat import rewrite_redshift_sql
from .plans.deps import query_dependencies
from .relations import Relation

logger = logging.getLogger(__name__)


@dataclass
class ValidationIssue:
    relation: str
    kind: str  # column_mismatch | dependency_mismatch | query_error
    message: str

    def __str__(self) -> str:
        return f"{self.relation}: [{self.kind}] {self.message}"


def diff_column_lists(declared: Sequence[str], actual: Sequence[str]) -> Optional[str]:
    """Human-readable minimal diff (reference validate.py:242-263)."""
    if list(declared) == list(actual):
        return None
    diff = difflib.ndiff(list(declared), list(actual))
    changes = [d for d in diff if d[:1] in "+-"]
    return "; ".join(changes)


def validate_transformation(
    spark: SparkSession, rel: Relation, check_dependencies: bool = True
) -> List[ValidationIssue]:
    """Dry-run one CTAS/VIEW: schema diff + dependency diff, no execution."""
    issues: List[ValidationIssue] = []
    query = rewrite_redshift_sql(rel.sql())
    try:
        df = spark.sql(query).limit(0)
    except Exception as exc:
        issues.append(ValidationIssue(rel.identifier, "query_error", str(exc).split("\n")[0]))
        return issues

    declared = rel.design.column_names
    actual = [f.name for f in df.schema.fields]
    if rel.design.identity_column is not None:
        declared = [c for c in declared if c != rel.design.identity_column.name]
    delta = diff_column_lists(declared, actual)
    if delta:
        issues.append(ValidationIssue(rel.identifier, "column_mismatch", delta))

    if check_dependencies:
        actual_deps = set(query_dependencies(spark, query))
        declared_deps = {d.lower() for d in rel.design.depends_on}
        missing = actual_deps - declared_deps
        extra = declared_deps - actual_deps
        if missing:
            issues.append(
                ValidationIssue(
                    rel.identifier,
                    "dependency_mismatch",
                    f"query reads undeclared relation(s): {sorted(missing)}",
                )
            )
        if extra:
            issues.append(
                ValidationIssue(
                    rel.identifier,
                    "dependency_mismatch",
                    f"declared but unused dependency(ies): {sorted(extra)}",
                )
            )
    return issues


def validate_relations(
    spark: SparkSession, relations: Sequence[Relation]
) -> List[ValidationIssue]:
    issues: List[ValidationIssue] = []
    for rel in relations:
        if rel.is_transformation:
            issues.extend(validate_transformation(spark, rel))
    return issues
