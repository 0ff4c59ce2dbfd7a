"""Real partitioned JDBC extraction end-to-end against embedded Derby.

Upgrades the extract planner from plan-shape tests to an executed
``spark.read.jdbc`` with range partitioning, condition pushdown, and the
sampling predicate — the full Sqoop-replacement path (SURVEY §2.1).
"""

import pytest

from arthur_redshift_etl_spark.design import (
    ColumnDefinition,
    ExtractSettings,
    TableDesign,
)
from arthur_redshift_etl_spark.sources.jdbc import plan_extract

N_ROWS = 1000


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "upstream")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE orders (o_orderkey BIGINT NOT NULL, "
        "o_totalprice DOUBLE, o_status VARCHAR(1))"
    )
    ps = conn.prepareStatement("INSERT INTO orders VALUES (?, ?, ?)")
    for i in range(N_ROWS):
        ps.setLong(1, i)
        ps.setDouble(2, i * 1.5)
        ps.setString(3, "OFP"[i % 3])
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    conn.close()
    return url


def orders_design(**extract):
    return TableDesign(
        name="src.orders",
        source_name="derby.app.orders",
        columns=[
            ColumnDefinition("o_orderkey", "long", not_null=True),
            ColumnDefinition("o_totalprice", "double"),
            ColumnDefinition("o_status", "string"),
        ],
        constraints=[{"primary_key": ["o_orderkey"]}],
        extract_settings=ExtractSettings(**extract) if extract else ExtractSettings(),
    )


def test_partitioned_extract_reads_all_rows(spark, derby_url):
    plan = plan_extract(orders_design(num_partitions=4))
    df = plan.read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == N_ROWS
    # Derby uppercases unquoted identifiers; Spark resolution is
    # case-insensitive so design-schema application still works
    assert {c.lower() for c in df.columns} == {"o_orderkey", "o_totalprice", "o_status"}


def test_extract_condition_pushdown(spark, derby_url):
    plan = plan_extract(
        orders_design(condition="o_totalprice > 750", num_partitions=4)
    )
    df = plan.read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS)
    # 1.5 * key > 750 → key > 500 → 499 rows
    assert df.count() == 499
    assert df.agg({"o_totalprice": "min"}).collect()[0][0] > 750


def test_sampling_extract(spark, derby_url):
    plan = plan_extract(
        orders_design(num_partitions=2),
        table_size_bytes=200 * 1024 * 1024,
        use_sampling=True,
    )
    assert "MOD(o_orderkey, 10)" in plan.query
    df = plan.read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS)
    assert df.count() == N_ROWS // 10  # keys ≡ 1 (mod 10)


def test_boundary_query_roundtrip(spark, derby_url):
    """Boundary query runs via JDBC and feeds the partition bounds."""
    plan = plan_extract(
        orders_design(
            boundary_query=(
                "SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders"
            ),
            num_partitions=4,
        )
    )
    bounds = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", f"({plan.boundary_query}) b")
        .load()
        .collect()[0]
    )
    lo, hi = bounds[0], bounds[1]
    assert (lo, hi) == (0, N_ROWS - 1)
    df = plan.read(spark, derby_url, lower_bound=lo, upper_bound=hi + 1)
    assert df.count() == N_ROWS


def test_jdbc_writeback_roundtrip(spark, derby_url):
    """Sink side: export a result table over JDBC, read it back (SURVEY §2.2)."""
    from arthur_redshift_etl_spark.sinks.jdbc import write_jdbc

    agg = (
        plan_extract(orders_design(num_partitions=4))
        .read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS)
        .groupBy("o_status")
        .count()
    )
    n = write_jdbc(agg, derby_url, "status_counts", num_partitions=1)
    assert n == 3
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "status_counts")
        .load()
    )
    assert back.count() == 3
    assert {r[0] for r in back.select("o_status").collect()} == {"O", "F", "P"}


def test_incremental_extract_moves_only_the_delta(spark, derby_url):
    """Watermark extract: only rows past the previous high-water mark
    travel, partitioned read machinery intact, and the union of
    incremental slices equals the full extract."""
    from arthur_redshift_etl_spark.sources.jdbc import plan_incremental_extract

    mark = N_ROWS // 2 - 1
    plan = plan_incremental_extract(
        orders_design(num_partitions=4), "o_orderkey", last_seen=mark
    )
    df = plan.read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS)
    got = sorted(r["O_ORDERKEY"] for r in df.collect())
    assert got == list(range(mark + 1, N_ROWS))

    # next run from the new mark: nothing new -> empty delta
    plan2 = plan_incremental_extract(
        orders_design(num_partitions=4), "o_orderkey", last_seen=N_ROWS - 1
    )
    assert plan2.read(spark, derby_url, lower_bound=0, upper_bound=N_ROWS).count() == 0


def test_incremental_extract_composes_with_condition(spark, derby_url):
    """The watermark predicate splices after an existing extract WHERE."""
    from arthur_redshift_etl_spark.sources.jdbc import plan_incremental_extract

    plan = plan_incremental_extract(
        orders_design(condition="o_status = 'O'"), "o_orderkey", last_seen=10
    )
    assert " WHERE " in plan.query and " AND " in plan.query
    df = plan.read(spark, derby_url)
    rows = df.collect()
    assert all(r["O_STATUS"] == "O" and r["O_ORDERKEY"] > 10 for r in rows)
    assert len(rows) == sum(
        1 for i in range(11, N_ROWS) if "OFP"[i % 3] == "O"
    )


def test_incremental_condition_requires_mark_and_quotes_timestamps():
    import pytest as _pytest

    from arthur_redshift_etl_spark.sources.jdbc import incremental_condition

    with _pytest.raises(ValueError):
        incremental_condition("ts", None)
    assert incremental_condition("id", 42) == "id > 42"
    c = incremental_condition("updated_at", "2026-01-01 00:00:00")
    # SQL-standard literal, portable across Postgres/Redshift/Derby/MySQL
    assert c == "updated_at > TIMESTAMP '2026-01-01 00:00:00'"
    # non-temporal string marks become plain literals (varchar watermarks)
    assert incremental_condition("batch_key", "A-1003") == "batch_key > 'A-1003'"
