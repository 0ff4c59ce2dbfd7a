"""dbt interop: manifest-driven impact analysis + db_source leaf scan.

Reference parity: ``python/etl/dbt.py:1-127`` (find_arthur_leaf_dbt_childs,
parse_dbt_run_stdout, render_dbt_list) — here driven from the public
``manifest.json`` artifact schema instead of a dockerized dbt run.
"""

import json

from arthur_redshift_etl_spark.dbt import (
    DBTRelation,
    DbtManifest,
    find_db_source_models,
    render_dbt_list,
)

MANIFEST = {
    "nodes": {
        "model.proj.stg_orders": {
            "name": "stg_orders",
            "resource_type": "model",
            "depends_on": {"nodes": ["source.proj.warehouse.orders"]},
            "config": {"materialized": "view", "tags": []},
        },
        "model.proj.fct_revenue": {
            "name": "fct_revenue",
            "resource_type": "model",
            "depends_on": {"nodes": ["model.proj.stg_orders"]},
            "config": {"materialized": "table", "tags": ["required"]},
        },
        "model.proj.unrelated": {
            "name": "unrelated",
            "resource_type": "model",
            "depends_on": {"nodes": ["source.proj.other.events"]},
            "config": {"materialized": "table", "tags": []},
        },
        "test.proj.not_a_model": {
            "name": "not_a_model",
            "resource_type": "test",
            "depends_on": {"nodes": ["model.proj.fct_revenue"]},
            "config": {},
        },
    },
    "sources": {
        "source.proj.warehouse.orders": {"schema": "warehouse", "name": "orders"},
        "source.proj.other.events": {"schema": "other", "name": "events"},
    },
}


def test_relations_parse():
    m = DbtManifest(MANIFEST)
    rels = {r.name: r for r in m.relations()}
    assert set(rels) == {"stg_orders", "fct_revenue", "unrelated"}
    assert rels["fct_revenue"] == DBTRelation(
        "fct_revenue", ["stg_orders"], "TABLE", True
    )
    assert rels["stg_orders"].type == "VIEW"
    assert rels["stg_orders"].is_required is False


def test_downstream_models_transitive():
    m = DbtManifest(MANIFEST)
    affected = m.downstream_models(["warehouse.orders"])
    assert [r.name for r in affected] == ["fct_revenue", "stg_orders"]
    # the unrelated source pulls only its own subtree
    assert [r.name for r in m.downstream_models(["other.events"])] == ["unrelated"]
    assert m.downstream_models(["nope.nothing"]) == []


def test_child_map_rebuilt_when_absent():
    doc = {k: v for k, v in MANIFEST.items()}
    doc.pop("child_map", None)
    m = DbtManifest(json.loads(json.dumps(doc)))
    assert "source.proj.warehouse.orders" in m.child_map


def test_manifest_load_roundtrip(tmp_path):
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps(MANIFEST))
    m = DbtManifest.load(str(p))
    assert len(m.relations()) == 3


def test_find_db_source_models(tmp_path):
    models = tmp_path / "models"
    models.mkdir()
    (models / "uses_orders.sql").write_text(
        "select * from {{ db_source('warehouse', 'orders') }} where x > 0"
    )
    (models / "uses_other.sql").write_text(
        "select * from {{ db_source('other', 'events') }}"
    )
    (models / "no_source.sql").write_text("select 1")
    hits = find_db_source_models(str(tmp_path), ["warehouse.orders"])
    assert hits == ["uses_orders"]


def test_render_dbt_list_format():
    m = DbtManifest(MANIFEST)
    lines = render_dbt_list(m.downstream_models(["warehouse.orders"]))
    assert len(lines) == 2
    assert lines[0].startswith("fct_revenue")
    assert "# TABLE" in lines[0] and "is_required=True" in lines[0]
    assert render_dbt_list([]) == []


def test_cli_show_dbt_downstream(tmp_path, capsys):
    """End-to-end through the CLI with a manifest naming a repo relation."""
    import os

    from arthur_redshift_etl_spark.cli import main
    from arthur_redshift_etl_spark.repo import write_design

    root = str(tmp_path / "repo")
    os.makedirs(root, exist_ok=True)
    write_design(
        root,
        {
            "name": "src.orders",
            "source_name": "up.public.orders",
            "columns": [{"name": "o_orderkey", "type": "long", "not_null": True}],
        },
    )
    manifest = {
        "nodes": {
            "model.proj.uses_dw": {
                "name": "uses_dw",
                "resource_type": "model",
                "depends_on": {"nodes": ["source.proj.src.orders"]},
                "config": {"materialized": "table", "tags": []},
            }
        },
        "sources": {"source.proj.src.orders": {"schema": "src", "name": "orders"}},
    }
    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps(manifest))
    rc = main(
        ["--repo", root, "show_dbt_downstream", "src.orders", "--manifest", str(mp)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "uses_dw" in out
    assert "1 downstream model(s)" in out
