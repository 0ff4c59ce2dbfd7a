"""Plan-based dependency extraction, dry-run validation, bootstrap, lint."""

import pytest

from arthur_redshift_etl_spark.bootstrap import (
    bootstrap_source_design,
    bootstrap_transformation_design,
)
from arthur_redshift_etl_spark.design import ColumnDefinition, TableDesign
from arthur_redshift_etl_spark.plans.deps import query_dependencies
from arthur_redshift_etl_spark.plans.lint import lint_plan, scan_pushdown_report
from arthur_redshift_etl_spark.relations import Relation
from arthur_redshift_etl_spark.validate import diff_column_lists, validate_transformation


def test_query_dependencies_parsed_plan(spark):
    q = """
    WITH x AS (SELECT * FROM dw.fact f JOIN src.orders o ON f.k = o.k)
    SELECT * FROM x JOIN other.dim d ON x.k = d.k
    """
    deps = query_dependencies(spark, q)
    assert deps == ["dw.fact", "other.dim", "src.orders"]


def test_query_dependencies_excludes_ctes(spark):
    q = "WITH a AS (SELECT 1 AS x) SELECT * FROM a JOIN src.t ON a.x = src.t.x"
    assert query_dependencies(spark, q) == ["src.t"]


def test_validate_transformation_column_and_dep_diff(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("v_nation")
    rel = Relation(
        design=TableDesign(
            name="dw.t",
            source_name="CTAS",
            columns=[ColumnDefinition("n_name"), ColumnDefinition("wrong_col")],
            depends_on=["dw.ghost"],
        ),
        query="SELECT n_name, n_nationkey FROM v_nation",
    )
    issues = validate_transformation(spark, rel)
    kinds = sorted(i.kind for i in issues)
    assert kinds == ["column_mismatch", "dependency_mismatch", "dependency_mismatch"]


def test_validate_query_error(spark):
    rel = Relation(
        design=TableDesign(
            name="dw.bad", source_name="CTAS", columns=[ColumnDefinition("x")]
        ),
        query="SELECT FROM nothing WHERE",
    )
    issues = validate_transformation(spark, rel)
    assert issues and issues[0].kind == "query_error"


def test_diff_column_lists():
    assert diff_column_lists(["a", "b"], ["a", "b"]) is None
    d = diff_column_lists(["a", "b", "c"], ["a", "c"])
    assert "- b" in d


def test_bootstrap_source_design(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    design = bootstrap_source_design(df, "src.orders", "up.public.orders", ["o_orderkey"])
    by = {c.name: c for c in design.columns}
    assert by["o_orderkey"].type == "long"
    assert by["o_totalprice"].type == "double"
    assert by["o_orderdate"].type == "timestamp"
    assert design.constraint_items() == [("primary_key", ["o_orderkey"])]


def test_bootstrap_transformation_design(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS srcboot")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.mode("overwrite").saveAsTable(
        "srcboot.nation"
    )
    design = bootstrap_transformation_design(
        spark,
        "dw.nations",
        "SELECT n_nationkey, upper(n_name) AS name_upper FROM srcboot.nation",
    )
    assert [c.name for c in design.columns] == ["n_nationkey", "name_upper"]
    assert design.depends_on == ["srcboot.nation"]
    assert design.kind == "CTAS"
    view = bootstrap_transformation_design(
        spark, "dw.v", "SELECT n_nationkey FROM srcboot.nation", as_view=True
    )
    assert view.kind == "VIEW"
    spark.sql("DROP DATABASE srcboot CASCADE")


def test_lint_flags_cartesian_and_pushdown(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/nation.parquet")
    b = spark.read.parquet(f"{sf_dir}/region.parquet")
    warnings = lint_plan(a.crossJoin(b))
    assert any(w.code in ("CARTESIAN", "NL_JOIN") for w in warnings)

    filtered = a.filter("n_nationkey > 5").select("n_name")
    report = scan_pushdown_report(filtered)
    assert any("PushedFilters" in line for line in report)


def test_discover_sources_globs(spark, sf_dir):
    from arthur_redshift_etl_spark.bootstrap import discover_sources

    spark.sql("CREATE DATABASE IF NOT EXISTS disc")
    for name in ("orders", "orders_archive", "lineitem"):
        spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1).write.mode(
            "overwrite"
        ).saveAsTable(f"disc.{name}")
    assert discover_sources(spark, "disc", include=["orders*"]) == [
        "orders",
        "orders_archive",
    ]
    assert discover_sources(spark, "disc", exclude=["*_archive"]) == [
        "lineitem",
        "orders",
    ]
    spark.sql("DROP DATABASE disc CASCADE")


def test_column_lineage_joins_aggregates_windows(spark, sf_dir):
    from arthur_redshift_etl_spark.plans.lineage import column_lineage
    from arthur_redshift_etl_spark.workload import t as load_table

    for v in ["nation", "customer"]:
        load_table(spark, sf_dir, v).createOrReplaceTempView(v)
    df = spark.sql(
        """
        SELECT n_name AS nation, COUNT(*) AS n_cust, SUM(c_acctbal) AS total_bal,
               1 AS const_col
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    lin = column_lineage(df)
    assert lin["nation"] == ["nation.n_name"]
    assert lin["total_bal"] == ["customer.c_acctbal"]
    assert lin["n_cust"] == []         # COUNT(*) references nothing
    assert lin["const_col"] == []      # literal
    # explode + window flow through Generate and Window nodes
    df2 = spark.sql(
        """
        SELECT tok, rk FROM (
          SELECT explode(split(n_name, ' ')) AS tok,
                 ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rk
          FROM nation
        )
        """
    )
    lin2 = column_lineage(df2)
    assert lin2["tok"] == ["nation.n_name"]
    assert lin2["rk"] == ["nation.n_nationkey"]
    # union maps positionally onto every branch
    df3 = spark.sql(
        "SELECT n_name AS x FROM nation UNION ALL SELECT c_name FROM customer"
    )
    lin3 = column_lineage(df3)
    assert lin3["x"] == ["customer.c_name", "nation.n_name"]


def test_executed_metrics_scan_summary(spark, sf_dir):
    from arthur_redshift_etl_spark.plans.metrics import executed_metrics, scan_summary
    from arthur_redshift_etl_spark.workload import REGISTRY

    df = REGISTRY["revenue_by_nation"].fn(spark, sf_dir)
    n = len(df.collect())
    m = executed_metrics(df)
    assert len(m) > 20  # scans, exchanges, aggregates all reporting
    s = scan_summary(df)
    # 4 tables scanned, each one parquet file; root outputs the result rows
    assert s["files_read"] == 4
    assert s["bytes_read"] > 0
    assert s["output_rows"] == n
    # scans saw at least all lineitem rows
    from arthur_redshift_etl_spark.workload import t as load_table

    assert s["rows_scanned"] >= load_table(spark, sf_dir, "lineitem").count()
