"""Upstream column/constraint validation against live JDBC metadata.

Reference parity: ``python/etl/validate.py:339-470``
(``validate_upstream_columns`` / ``validate_upstream_constraints``) — design
columns must exist upstream, not_null/PK/unique must be enforced upstream.
Runs against embedded Derby (same harness as test_jdbc_extract_e2e).
"""

import pytest

from arthur_redshift_etl_spark.design import ColumnDefinition, TableDesign
from arthur_redshift_etl_spark.sources.metadata import fetch_upstream_info
from arthur_redshift_etl_spark.validate import (
    validate_upstream_columns,
    validate_upstream_constraints,
    validate_upstream_relation,
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby_meta") / "upstream")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    # conforming table: PK on id, unique on email, not-null name
    st.execute(
        "CREATE TABLE customers (id BIGINT NOT NULL PRIMARY KEY, "
        "name VARCHAR(50) NOT NULL, email VARCHAR(50), "
        "CONSTRAINT uq_email UNIQUE (email))"
    )
    # drifted table: design will expect a column/constraints it doesn't have
    st.execute(
        "CREATE TABLE drifted (id BIGINT, name VARCHAR(50), extra_col INT)"
    )
    conn.commit()
    conn.close()
    return url


def customers_design(**kw):
    base = dict(
        name="src.customers",
        source_name="derby.app.customers",
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("name", "string", not_null=True),
            ColumnDefinition("email", "string"),
        ],
        constraints=[{"primary_key": ["id"]}, {"unique": ["email"]}],
    )
    base.update(kw)
    return TableDesign(**base)


def test_fetch_upstream_info(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "customers")
    assert info.column_names == ["id", "name", "email"]
    assert info.not_null_columns == {"id", "name"}
    assert info.primary_key == ["id"]
    assert frozenset({"email"}) in info.uniques


def test_conforming_design_is_clean(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design()
    issues = validate_upstream_columns(design, info) + validate_upstream_constraints(
        design, info
    )
    assert [i for i in issues if i.severity == "error"] == []


def test_missing_required_column_is_error(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design(
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("name", "string"),
            ColumnDefinition("vanished", "string"),  # not upstream
        ],
        constraints=[{"primary_key": ["id"]}],
    )
    issues = validate_upstream_columns(design, info)
    errs = [i for i in issues if i.severity == "error"]
    assert any(i.kind == "upstream_missing_column" and "vanished" in i.message
               for i in errs)


def test_skipped_and_calculated_columns_exempt(spark, derby_url):
    """skipped → warning only; etl__ calculated columns ignored entirely."""
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design(
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("name", "string"),
            ColumnDefinition("email", "string"),
            ColumnDefinition("legacy", "string", skipped=True),  # gone upstream
            ColumnDefinition("etl__loaded_at", "timestamp"),  # calculated
        ],
        constraints=[{"primary_key": ["id"]}],
    )
    issues = validate_upstream_columns(design, info)
    assert [i for i in issues if i.severity == "error"] == []
    warns = [i for i in issues if i.severity == "warning"]
    assert any("legacy" in i.message for i in warns)
    assert not any("etl__loaded_at" in i.message for i in issues)


def test_not_null_drift_is_error(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design(
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("name", "string"),
            ColumnDefinition("email", "string", not_null=True),  # nullable upstream
        ],
        constraints=[{"primary_key": ["id"]}],
    )
    issues = validate_upstream_columns(design, info)
    assert any(i.kind == "upstream_nullability" and "email" in i.message
               and i.severity == "error" for i in issues)


def test_unenforced_pk_and_unique_are_errors(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "drifted")
    design = TableDesign(
        name="src.drifted",
        source_name="derby.app.drifted",
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("name", "string"),
        ],
        constraints=[{"primary_key": ["id"]}, {"unique": ["name"]}],
    )
    issues = validate_upstream_constraints(design, info)
    msgs = [i.message for i in issues if i.severity == "error"]
    assert any("primary_key" in m and "not enforced" in m for m in msgs)
    assert any("unique" in m and "not enforced" in m for m in msgs)
    # nullability drift too: design not_null id, upstream nullable
    col_issues = validate_upstream_columns(design, info)
    assert any(i.kind == "upstream_nullability" for i in col_issues)
    # extra upstream column surfaces as a warning
    assert any(i.kind == "upstream_extra_column" and "extra_col" in i.message
               for i in col_issues)


def test_pk_satisfies_design_unique(spark, derby_url):
    """A unique design constraint may be backed by the upstream PK
    (reference validate.py:447-455), not vice versa."""
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design(constraints=[{"unique": ["id"]}])
    issues = validate_upstream_constraints(design, info)
    assert [i for i in issues if i.severity == "error"] == []


def test_pk_mismatch_is_error(spark, derby_url):
    info = fetch_upstream_info(spark, derby_url, "customers")
    design = customers_design(constraints=[{"primary_key": ["email"]}])
    issues = validate_upstream_constraints(design, info)
    assert any("does not match upstream" in i.message and i.severity == "error"
               for i in issues)
    # and the real upstream PK is reported as unused
    assert any("additional primary_key" in i.message and i.severity == "warning"
               for i in issues)


def test_vanished_table_is_error(spark, derby_url):
    from arthur_redshift_etl_spark.relations import Relation

    design = customers_design(source_name="derby.app.no_such_table")
    rel = Relation(design=design)
    issues = validate_upstream_relation(spark, rel, derby_url)
    assert any(i.kind == "upstream_missing_table" for i in issues)
