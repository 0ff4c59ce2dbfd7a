"""Column-level lineage from the analyzed logical plan.

Table-level dependency extraction (``deps.py``) answers *which relations* a
transformation reads; this answers *which source columns feed each output
column* — the impact-analysis question behind the reference's column-diff
validation (``validate.py:242-263``): renaming an upstream column should
tell you exactly which downstream outputs break.

Mechanism: every attribute in a Spark analyzed plan carries a globally
unique ``exprId``.  Named expressions (projections, aggregates, windows,
generators) map their output exprId to the exprIds they reference; leaf
scan nodes own the exprIds of physical columns.  Lineage is the transitive
closure output-exprId → leaf-exprIds, resolved to (table, column) pairs.
Pure plan inspection through py4j — no Catalyst extension, nothing
executed.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

from pyspark.sql import DataFrame


def _iter(jseq):
    it = jseq.iterator()
    while it.hasNext():
        yield it.next()


def _named_refs(named_expr) -> Tuple[int, Set[int]]:
    out_id = named_expr.exprId().id()
    refs = {a.exprId().id() for a in _iter(named_expr.references())}
    return out_id, refs


def _leaf_label(leaf) -> str:
    """Best-available relation label for a leaf scan node."""
    try:
        ct = leaf.catalogTable()
        if ct.isDefined():
            ident = ct.get().identifier()
            return f"{ident.database().get()}.{ident.table()}" \
                if ident.database().isDefined() else ident.table()
    except Exception:
        pass
    s = leaf.toString().splitlines()[0]
    # file relations render as "Relation [cols] parquet" etc.; fall back to
    # the first path-ish token or the node name
    import re

    m = re.search(r"spark_catalog\.([\w.]+)", s)
    if m:
        return ".".join(m.group(1).split(".")[-2:])
    m = re.search(r"file:[^\s,\]]*/([^/\s,\]]+)", s)
    if m:
        return m.group(1)
    return leaf.nodeName()


def column_lineage(df: DataFrame) -> Dict[str, List[str]]:
    """Map each output column to its source ``table.column`` set.

    Derived columns (literals, generated ids) map to an empty list.  Columns
    flowing through joins/filters/aliases keep their identity (same
    exprId); Union maps outputs positionally onto every branch.
    """
    plan = df._jdf.queryExecution().analyzed()

    edges: Dict[int, Set[int]] = {}
    leaves: Dict[int, Tuple[str, str]] = {}
    alias_of: Dict[int, str] = {}  # exprId → nearest enclosing relation alias

    def visit(node) -> None:
        name = node.nodeName()
        if name == "SubqueryAlias":
            # view/table aliases wrap their relation and pass exprIds
            # through unchanged — the best human-readable label for a leaf
            alias = node.alias()
            for attr in _iter(node.output()):
                alias_of.setdefault(attr.exprId().id(), alias)
        if name in ("Project",):
            for ne in _iter(node.projectList()):
                out_id, refs = _named_refs(ne)
                edges.setdefault(out_id, set()).update(refs)
        elif name in ("Aggregate",):
            for ne in _iter(node.aggregateExpressions()):
                out_id, refs = _named_refs(ne)
                edges.setdefault(out_id, set()).update(refs)
        elif name in ("Window",):
            for ne in _iter(node.windowExpressions()):
                out_id, refs = _named_refs(ne)
                edges.setdefault(out_id, set()).update(refs)
        elif name in ("Generate",):
            gen_refs = {
                a.exprId().id() for a in _iter(node.generator().references())
            }
            for attr in _iter(node.generatorOutput()):
                edges.setdefault(attr.exprId().id(), set()).update(gen_refs)
        elif name in ("Union",):
            outs = list(_iter(node.output()))
            for child in _iter(node.children()):
                child_outs = list(_iter(child.output()))
                for o, c in zip(outs, child_outs):
                    edges.setdefault(o.exprId().id(), set()).add(c.exprId().id())
        if node.children().isEmpty():
            label = _leaf_label(node)
            for attr in _iter(node.output()):
                eid = attr.exprId().id()
                leaves[eid] = (alias_of.get(eid, label), attr.name())
        for child in _iter(node.children()):
            visit(child)
        # subqueries (scalar/EXISTS) hang off expressions, not children —
        # their internals don't feed output columns, so they're skipped.

    visit(plan)

    def resolve(eid: int, seen: Set[int]) -> Set[Tuple[str, str]]:
        if eid in leaves:
            return {leaves[eid]}
        if eid in seen:
            return set()
        seen.add(eid)
        out: Set[Tuple[str, str]] = set()
        for ref in edges.get(eid, ()):  # literals/ids resolve to nothing
            out |= resolve(ref, seen)
        return out

    result: Dict[str, List[str]] = {}
    for attr in _iter(plan.output()):
        srcs = resolve(attr.exprId().id(), set())
        result[attr.name()] = sorted(f"{t}.{c}" for t, c in srcs)
    return result
