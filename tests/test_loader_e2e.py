"""End-to-end loader test: file-set discovery → DAG → blue-green load →
constraint verification → publish → query (FIXTURES.md F2/F3 shapes)."""

import os

import pytest
import yaml

from arthur_redshift_etl_spark.errors import (
    FailedConstraintError,
    RequiredRelationLoadError,
)
from arthur_redshift_etl_spark.loader import (
    LoadContext,
    build_one_relation,
    load_warehouse,
    rewrite_query_for_staging,
    upgrade_warehouse,
)
from arthur_redshift_etl_spark.monitor import EventStore
from arthur_redshift_etl_spark.names import TableSelector
from arthur_redshift_etl_spark.repo import find_file_sets, write_design

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def make_repo(root, spark):
    """Designs for two source tables + one CTAS dim + one fact + two views."""
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    # source data dirs: copy the driver's parquet in as local "extracted" data
    for name in ("customer", "nation", "orders", "lineitem"):
        d = os.path.join(root, "data", "src", name)
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").write.mode("overwrite").parquet(d)

    write_design(
        root,
        {
            "name": "src.customer",
            "source_name": "upstream.public.customer",
            "columns": [
                {"name": "c_custkey", "type": "long", "not_null": True},
                {"name": "c_name", "type": "string"},
                {"name": "c_nationkey", "type": "int"},
                {"name": "c_acctbal", "type": "double"},
                {"name": "c_mktsegment", "type": "string"},
            ],
            "constraints": [{"primary_key": ["c_custkey"]}],
        },
    )
    write_design(
        root,
        {
            "name": "src.nation",
            "source_name": "upstream.public.nation",
            "columns": [
                {"name": "n_nationkey", "type": "int", "not_null": True},
                {"name": "n_name", "type": "string"},
                {"name": "n_regionkey", "type": "int"},
            ],
            "constraints": [{"primary_key": ["n_nationkey"]}],
        },
    )
    write_design(
        root,
        {
            "name": "src.orders",
            "source_name": "upstream.public.orders",
            "columns": [
                {"name": "o_orderkey", "type": "long", "not_null": True},
                {"name": "o_custkey", "type": "long"},
                {"name": "o_orderstatus", "type": "string"},
                {"name": "o_totalprice", "type": "double"},
                {"name": "o_orderdate", "type": "timestamp"},
                {"name": "o_orderpriority", "type": "string"},
            ],
            "constraints": [{"primary_key": ["o_orderkey"]}],
            "extract_settings": {"split_by": ["o_orderkey"], "num_partitions": 4},
        },
    )
    write_design(
        root,
        {
            "name": "src.lineitem",
            "source_name": "upstream.public.lineitem",
            "columns": [
                {"name": "l_orderkey", "type": "long", "not_null": True},
                {"name": "l_linenumber", "type": "int", "not_null": True},
                {"name": "l_quantity", "type": "double"},
                {"name": "l_extendedprice", "type": "double"},
                {"name": "l_discount", "type": "double"},
                {"name": "l_shipdate", "type": "timestamp"},
            ],
        },
    )
    write_design(
        root,
        {
            "name": "dw.dim_customer",
            "source_name": "CTAS",
            "columns": [
                {"name": "customer_key", "type": "long", "identity": True, "not_null": True},
                {"name": "c_custkey", "type": "long", "not_null": True},
                {"name": "c_name", "type": "string"},
                {"name": "nation_name", "type": "string"},
                {"name": "c_mktsegment", "type": "string"},
            ],
            "constraints": [{"surrogate_key": ["customer_key"]}],
            "depends_on": ["src.customer", "src.nation"],
        },
        query="""
        SELECT c_custkey, c_name, n_name AS nation_name, c_mktsegment
        FROM src.customer JOIN src.nation ON c_nationkey = n_nationkey
        """,
    )
    write_design(
        root,
        {
            "name": "dw.fact_order_line",
            "source_name": "CTAS",
            "columns": [
                {"name": "l_orderkey", "type": "long", "not_null": True},
                {"name": "l_linenumber", "type": "int", "not_null": True},
                {"name": "o_custkey", "type": "long"},
                {"name": "o_orderdate", "type": "timestamp"},
                {"name": "gross", "type": "double"},
            ],
            "attributes": {"distribution": ["o_custkey"], "compound_sort": ["o_orderdate"]},
            "depends_on": ["src.orders", "src.lineitem"],
        },
        query="""
        SELECT l_orderkey, l_linenumber, o_custkey, o_orderdate,
               l_extendedprice * (1 - l_discount) AS gross
        FROM src.lineitem JOIN src.orders ON l_orderkey = o_orderkey
        """,
    )
    write_design(
        root,
        {
            "name": "dw.v_revenue_by_nation",
            "source_name": "VIEW",
            "columns": [{"name": "nation_name"}, {"name": "revenue"}, {"name": "n_lines"}],
            "depends_on": ["dw.fact_order_line", "dw.dim_customer"],
        },
        query="""
        SELECT d.nation_name AS nation_name, SUM(f.gross) AS revenue,
               COUNT(*) AS n_lines
        FROM dw.fact_order_line f
        JOIN dw.dim_customer d ON f.o_custkey = d.c_custkey
        GROUP BY d.nation_name
        """,
    )
    write_design(
        root,
        {
            "name": "dw.v_top_nations",
            "source_name": "VIEW",
            "columns": [{"name": "nation_name"}, {"name": "revenue"}, {"name": "rnk"}],
            "depends_on": ["dw.v_revenue_by_nation"],
        },
        query="""
        SELECT nation_name, revenue, rnk FROM (
          SELECT nation_name, revenue,
                 ROW_NUMBER() OVER (ORDER BY revenue DESC) AS rnk
          FROM dw.v_revenue_by_nation
        ) WHERE rnk <= 5
        """,
    )
    return root


@pytest.fixture()
def warehouse(spark, tmp_path):
    root = make_repo(str(tmp_path / "repo"), spark)
    ctx = LoadContext(
        spark=spark, data_root=str(tmp_path / "lake"), store=EventStore()
    )
    yield spark, root, ctx
    for db in [r.namespace for r in spark.sql("SHOW DATABASES").collect()]:
        if db != "default":
            spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")


def test_full_blue_green_load(warehouse):
    spark, root, ctx = warehouse
    relations = find_file_sets(root)
    assert len(relations) == 8
    load_warehouse(ctx, relations)

    # production tables exist and carry data
    n_cust = spark.table("src.customer").count()
    assert n_cust > 0
    dim = spark.table("dw.dim_customer")
    # identity + no na-row surprises: row per customer + 1 na-row
    assert dim.count() == n_cust + 1
    na = dim.filter("customer_key = 0").collect()
    assert len(na) == 1 and na[0]["c_name"] == "N/A"
    # views work against production names after publish
    top = spark.table("dw.v_top_nations").collect()
    assert 0 < len(top) <= 5
    assert top[0]["rnk"] == 1
    # staging dropped
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert not any(db.startswith("etl_staging__") for db in dbs)
    # monitor recorded finish events with rowcounts
    finishes = [e for e in ctx.store.events() if e["event"] == "finish"]
    assert len(finishes) == 8


def test_constraint_failure_aborts_required(warehouse, tmp_path):
    spark, root, ctx = warehouse
    # corrupt: duplicate a customer row so the PK fails
    dup_dir = os.path.join(root, "data", "src", "customer")
    df = spark.read.parquet(dup_dir)
    df.unionAll(df.limit(1)).write.mode("overwrite").parquet(dup_dir + "_dup")
    import shutil

    shutil.rmtree(dup_dir)
    os.rename(dup_dir + "_dup", dup_dir)

    relations = find_file_sets(root)
    with pytest.raises(RequiredRelationLoadError):
        load_warehouse(
            ctx, relations, required_selector=TableSelector(["dw.v_revenue_by_nation"])
        )
    # production untouched (nothing published)
    assert not spark.catalog.tableExists("dw.dim_customer")


def test_optional_failure_builds_empty_dependents(warehouse):
    spark, root, ctx = warehouse
    # break the fact query
    with open(os.path.join(root, "schemas", "dw", "fact_order_line.sql"), "w") as fh:
        fh.write("SELECT broken_column FROM src.lineitem")
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)  # no required selector → degrade
    assert spark.table("src.customer").count() > 0
    assert spark.table("dw.dim_customer").count() > 0


def test_upgrade_in_place(warehouse):
    spark, root, ctx = warehouse
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)
    before = spark.table("dw.fact_order_line").count()
    ctx2 = LoadContext(spark=spark, data_root=ctx.data_root, store=EventStore())
    failed = upgrade_warehouse(
        ctx2, find_file_sets(root), TableSelector(["dw.fact_order_line"])
    )
    assert not failed
    assert spark.table("dw.fact_order_line").count() == before


def test_restore_schemas_undoes_bad_publish(warehouse):
    """publish good -> publish bad -> restore -> queries read the good data
    (reference restore_schemas, commands.py:1461-1474)."""
    from arthur_redshift_etl_spark.loader import restore_schemas

    spark, root, ctx = warehouse
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)
    good_fact = spark.table("dw.fact_order_line").count()
    good_rev = {
        r["nation_name"]: r["revenue"]
        for r in spark.table("dw.v_revenue_by_nation").collect()
    }
    assert good_fact > 0

    # "bad" second publish: half the lineitem rows vanish upstream
    li_dir = os.path.join(root, "data", "src", "lineitem")
    li = spark.read.parquet(li_dir)
    li.filter("l_orderkey % 2 = 0").write.mode("overwrite").parquet(li_dir + "_bad")
    import shutil

    shutil.rmtree(li_dir)
    os.rename(li_dir + "_bad", li_dir)
    ctx2 = LoadContext(spark=spark, data_root=ctx.data_root, store=EventStore())
    load_warehouse(ctx2, find_file_sets(root))
    bad_fact = spark.table("dw.fact_order_line").count()
    assert bad_fact < good_fact  # the bad data is live

    # session temp views shadow into every listTables() result; restore must
    # ignore them (regression: DESCRIBE backup_db.tempview blew up)
    spark.range(1).createOrReplaceTempView("stray_temp_view")
    restored = restore_schemas(ctx2, find_file_sets(root))
    assert "dw.fact_order_line" in restored
    assert not any("stray_temp_view" in ident for ident in restored)
    assert spark.table("dw.fact_order_line").count() == good_fact
    # views were recreated and resolve against the restored tables
    rev = {
        r["nation_name"]: r["revenue"]
        for r in spark.table("dw.v_revenue_by_nation").collect()
    }
    assert rev == good_rev
    # consumed backups are gone (a backup restores once)
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert not any(db.startswith("etl_backup__") for db in dbs)


def test_restore_schemas_selector_scopes_restore(warehouse):
    """A pattern-scoped restore touches only the matching schema."""
    from arthur_redshift_etl_spark.loader import restore_schemas

    spark, root, ctx = warehouse
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)
    good_fact = spark.table("dw.fact_order_line").count()
    good_cust = spark.table("src.customer").count()

    cust_dir = os.path.join(root, "data", "src", "customer")
    cust = spark.read.parquet(cust_dir)
    cust.limit(5).write.mode("overwrite").parquet(cust_dir + "_bad")
    import shutil

    shutil.rmtree(cust_dir)
    os.rename(cust_dir + "_bad", cust_dir)
    ctx2 = LoadContext(spark=spark, data_root=ctx.data_root, store=EventStore())
    load_warehouse(ctx2, find_file_sets(root))
    assert spark.table("src.customer").count() == 5

    restored = restore_schemas(
        ctx2, find_file_sets(root), TableSelector(["src"])
    )
    assert all(ident.startswith("src.") for ident in restored)
    assert spark.table("src.customer").count() == good_cust
    # dw was NOT restored: still the second publish's (recomputed) fact
    assert spark.table("dw.fact_order_line").count() == good_fact
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert "etl_backup__dw" in dbs  # unconsumed backup stays


def test_restore_schemas_nothing_to_restore_is_a_noop(warehouse):
    """With no backups left, restore must return [] and leave production
    views untouched (regression: views were dropped/recreated and reported
    as 'restored' even when no backup database existed)."""
    from arthur_redshift_etl_spark.loader import restore_schemas

    spark, root, ctx = warehouse
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)
    # second publish creates the backups; restore consumes them
    ctx2 = LoadContext(spark=spark, data_root=ctx.data_root, store=EventStore())
    load_warehouse(ctx2, find_file_sets(root))
    restored = restore_schemas(ctx2, relations)
    assert "dw.fact_order_line" in restored

    before = {
        r["nation_name"]: r["revenue"]
        for r in spark.table("dw.v_revenue_by_nation").collect()
    }
    again = restore_schemas(ctx, relations)
    assert again == []  # CLI maps this to 'nothing to restore', exit 1
    after = {
        r["nation_name"]: r["revenue"]
        for r in spark.table("dw.v_revenue_by_nation").collect()
    }
    assert after == before


def test_external_relation_attached_in_place(warehouse, tmp_path):
    """EXTERNAL kind (Spectrum analog): registered at its location, zero
    copy; dependents query it; constraints are not load-enforced."""
    spark, root, ctx = warehouse
    ext_dir = str(tmp_path / "ext" / "clickstream")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").write.parquet(ext_dir)

    write_design(
        root,
        {
            "name": "ext.clickstream",
            "source_name": "EXTERNAL",
            "columns": [
                {"name": "o_orderkey", "type": "long", "not_null": True},
                {"name": "o_totalprice", "type": "double"},
            ],
            "attributes": {"location": ext_dir},
        },
    )
    write_design(
        root,
        {
            "name": "dw.click_totals",
            "source_name": "CTAS",
            "columns": [{"name": "n", "type": "long"}, {"name": "total", "type": "double"}],
            "depends_on": ["ext.clickstream"],
        },
        query="SELECT COUNT(*) AS n, SUM(o_totalprice) AS total FROM ext.clickstream",
    )
    relations = find_file_sets(root)
    load_warehouse(ctx, relations)

    expected = spark.read.parquet(ext_dir).count()
    assert spark.table("ext.clickstream").count() == expected
    # attached IN PLACE: the production table reads the external directory
    loc = (
        spark.sql("DESCRIBE FORMATTED ext.clickstream")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    assert loc.replace("file:", "") == ext_dir
    # dependent transformation resolved it during the staged build
    row = spark.table("dw.click_totals").collect()[0]
    assert row["n"] == expected


def test_external_relation_schema_mismatch_fails(warehouse, tmp_path):
    from arthur_redshift_etl_spark.loader import build_one_relation

    spark, root, ctx = warehouse
    ext_dir = str(tmp_path / "ext" / "bad")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").write.parquet(ext_dir)
    write_design(
        root,
        {
            "name": "ext.bad",
            "source_name": "EXTERNAL",
            "columns": [{"name": "no_such_column", "type": "long"}],
            "attributes": {"location": ext_dir},
        },
    )
    rel = [r for r in find_file_sets(root) if r.identifier == "ext.bad"][0]
    from arthur_redshift_etl_spark.errors import ETLRuntimeError

    with pytest.raises(ETLRuntimeError, match="lacks design column"):
        build_one_relation(ctx, rel, use_staging=False)

    # a present column with the WRONG TYPE is equally an error (in-place
    # registration cannot cast files it does not own)
    write_design(
        root,
        {
            "name": "ext.badtype",
            "source_name": "EXTERNAL",
            # nation.parquet's n_name is a string, not a long
            "columns": [{"name": "n_name", "type": "long"}],
            "attributes": {"location": ext_dir},
        },
    )
    rel2 = [r for r in find_file_sets(root) if r.identifier == "ext.badtype"][0]
    with pytest.raises(ETLRuntimeError, match="type mismatch is an error"):
        build_one_relation(ctx, rel2, use_staging=False)


def test_attach_external_schema_directory_of_tables(warehouse, tmp_path):
    from arthur_redshift_etl_spark.loader import attach_external_schema
    from arthur_redshift_etl_spark.errors import ETLRuntimeError

    spark, root, ctx = warehouse
    base = str(tmp_path / "extdb")
    for name in ("nation", "region"):
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").write.parquet(
            os.path.join(base, name)
        )
    attached = attach_external_schema(ctx, "lake", base)
    assert attached == ["lake.nation", "lake.region"]
    assert spark.table("lake.nation").count() == spark.read.parquet(
        f"{SF_DIR}/nation.parquet"
    ).count()
    empty_dir = str(tmp_path / "empty_db")
    os.makedirs(empty_dir)
    with pytest.raises(ETLRuntimeError, match="no parquet tables"):
        attach_external_schema(ctx, "empty", empty_dir)
    with pytest.raises(ETLRuntimeError, match="not a directory"):
        attach_external_schema(ctx, "empty", str(tmp_path / "nothing_here"))


def test_rewrite_query_for_staging():
    q = "SELECT * FROM dw.fact f JOIN src.orders o ON f.k = o.k WHERE 'dw.fact' = 'x'"
    out = rewrite_query_for_staging(q, ["dw.fact", "src.orders"])
    assert "etl_staging__dw.fact f" in out
    assert "etl_staging__src.orders o" in out
    # string literal containing an identifier is ALSO rewritten by the
    # reference's regex approach — acceptable fidelity; just assert behavior
    assert out.count("etl_staging__dw.fact") == 2
