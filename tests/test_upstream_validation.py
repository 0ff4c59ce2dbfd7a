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


# ---------------------------------------------------------------------------
# information_schema unique-constraint probe (non-Derby engines): exercised
# through a duck-typed fake JDBC connection, since the embedded test DB has
# no information_schema.  Pins the ADVICE-r2 fixes: identifier values bound
# as ? parameters (never interpolated) and the key_column_usage join
# correlated on table_schema + constraint_schema.
# ---------------------------------------------------------------------------

class _FakeResultSet:
    def __init__(self, rows):
        self._rows = rows
        self._i = -1
        self.closed = False

    def next(self):
        self._i += 1
        return self._i < len(self._rows)

    def getString(self, label):
        return self._rows[self._i][label]

    def close(self):
        self.closed = True


class _FakePreparedStatement:
    def __init__(self, sql, rows, log):
        self.sql = sql
        self._rows = rows
        self._log = log
        self.params = {}

    def setString(self, idx, value):
        self.params[idx] = value

    def executeQuery(self):
        self._log.append((self.sql, dict(self.params)))
        return _FakeResultSet(self._rows)

    def close(self):
        pass


class _FakeConn:
    def __init__(self, rows):
        self.rows = rows
        self.executed = []

    def prepareStatement(self, sql):
        return _FakePreparedStatement(sql, self.rows, self.executed)


def test_information_schema_probe_binds_params_and_correlates_schema():
    from arthur_redshift_etl_spark.sources.metadata import (
        _fetch_uniques_information_schema,
    )

    rows = [
        {"constraint_name": "u1", "column_name": "EMAIL"},
        {"constraint_name": "u2", "column_name": "A"},
        {"constraint_name": "u2", "column_name": "B"},
    ]
    conn = _FakeConn(rows)
    out = _fetch_uniques_information_schema(conn, "app", "customers'; DROP--")
    assert out == [frozenset({"email"}), frozenset({"a", "b"})]

    (sql, params), = conn.executed
    # identifiers reach the query ONLY as bound parameters
    assert "customers" not in sql and "app" not in sql
    assert params == {1: "customers'; DROP--", 2: "app", 3: "app"}
    # schema correlation on the kcu join and both schema filters present
    assert "tc.constraint_schema = kcu.constraint_schema" in sql
    assert "tc.table_schema = kcu.table_schema" in sql
    assert "tc.table_schema = ?" in sql and "kcu.table_schema = ?" in sql


def test_information_schema_probe_without_schema_binds_one_param():
    from arthur_redshift_etl_spark.sources.metadata import (
        _fetch_uniques_information_schema,
    )

    conn = _FakeConn([])
    assert _fetch_uniques_information_schema(conn, None, "t") == []
    (sql, params), = conn.executed
    assert params == {1: "t"}
    assert "tc.table_schema = ?" not in sql
