"""Extract planning, CSV round-trip fidelity, manifests, retry, monitor."""

import datetime
import doctest
import json
import os

import pytest

import arthur_redshift_etl_spark.retry as retry_mod
import arthur_redshift_etl_spark.sources.jdbc as jdbc_mod
from arthur_redshift_etl_spark.design import ColumnDefinition, ExtractSettings, TableDesign
from arthur_redshift_etl_spark.errors import DataUnloadError, MissingRelationError
from arthur_redshift_etl_spark.monitor import EventStore, Monitor
from arthur_redshift_etl_spark.sinks.unload import unload, validate_reload_columns
from arthur_redshift_etl_spark.sources.files import (
    apply_design_schema,
    read_manifest,
    read_source,
    write_manifest,
)
from arthur_redshift_etl_spark.sources.jdbc import plan_extract


@pytest.mark.parametrize("mod", [jdbc_mod, retry_mod])
def test_doctests(mod):
    failures, _ = doctest.testmod(mod, verbose=False)
    assert failures == 0


def orders_design(**extract):
    return TableDesign(
        name="src.orders",
        source_name="upstream.public.orders",
        columns=[
            ColumnDefinition("o_orderkey", "long", not_null=True),
            ColumnDefinition("o_totalprice", "double"),
            ColumnDefinition("o_comment", "string", skipped=True),
            ColumnDefinition(
                "o_payload", "string", expression="base64(%s)", sql_type="varchar(100)"
            ),
        ],
        constraints=[{"primary_key": ["o_orderkey"]}],
        extract_settings=ExtractSettings(**extract) if extract else ExtractSettings(),
    )


def test_plan_extract_pk_split():
    plan = plan_extract(orders_design(), table_size_bytes=1 << 30)
    assert plan.partition_column == "o_orderkey"
    assert plan.num_partitions == 32
    assert "o_comment" not in plan.query  # skipped column pruned
    assert "base64(o_payload) AS o_payload" in plan.query


def test_plan_extract_condition_and_sampling():
    plan = plan_extract(
        orders_design(condition="o_totalprice > 0"),
        table_size_bytes=200 * 1024 * 1024,
        use_sampling=True,
    )
    assert "WHERE (o_totalprice > 0) AND (MOD(o_orderkey, 10) = 1)" in plan.query
    assert plan.num_partitions == 1  # 200MiB / 4 < 100MiB sampled floor


def test_plan_extract_timestamp_key_epoch_cast():
    d = TableDesign(
        name="src.events",
        source_name="up.public.events",
        columns=[ColumnDefinition("ts", "timestamp", not_null=True)],
        extract_settings=ExtractSettings(split_by=["ts"]),
    )
    plan = plan_extract(d, table_size_bytes=1 << 30)
    assert plan.partition_column == "CAST(unix_timestamp(ts) AS BIGINT)"


def test_csv_unload_reload_roundtrip(spark, tmp_path):
    """F1 type-zoo fidelity: adversarial strings, NULL vs empty, timestamps."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("an_int", T.IntegerType(), True),
            T.StructField("a_double", T.DoubleType(), True),
            T.StructField("a_numeric", T.DecimalType(20, 4), True),
            T.StructField("a_boolean", T.BooleanType(), True),
            T.StructField("a_text", T.StringType(), True),
            T.StructField("a_date", T.DateType(), True),
            T.StructField("a_timestamp", T.TimestampNTZType(), True),
        ]
    )
    import decimal

    rows = [
        (1, 10, 1.5, decimal.Decimal("1234.5678"), True, None, datetime.date(2020, 1, 2),
         datetime.datetime(2020, 1, 2, 3, 4, 5)),
        (2, None, None, None, False, "", None, None),
        (3, 0, -2.25, decimal.Decimal("0.0001"), None, '"Start quote', None, None),
        (4, 5, 3.0, None, True, 'End quote"', datetime.date(1999, 12, 31), None),
        (5, 6, 4.0, None, True, "comma, separated, values", None, None),
        (6, 7, 5.0, None, False, "'This' line\nbroke.", None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "unloaded")
    manifest = unload(df, path)
    assert os.path.exists(manifest)
    assert read_manifest(manifest)
    assert os.path.exists(os.path.join(path, "columns.yaml"))

    design = TableDesign(
        name="reload.type_zoo",
        source_name="up.public.type_zoo",
        columns=[
            ColumnDefinition("id", "long", not_null=True),
            ColumnDefinition("an_int", "int"),
            ColumnDefinition("a_double", "double"),
            ColumnDefinition("a_numeric", "decimal", sql_type="numeric(20,4)"),
            ColumnDefinition("a_boolean", "boolean"),
            ColumnDefinition("a_text", "string", sql_type="varchar(255)"),
            ColumnDefinition("a_date", "date"),
            ColumnDefinition("a_timestamp", "timestamp"),
        ],
    )
    raw = read_source(spark, path, "csv", schema=design.to_spark_schema())
    back = apply_design_schema(raw, design)
    key = lambda r: tuple(repr(x) for x in r)  # noqa: E731 — None-safe sort
    got = sorted([tuple(r) for r in back.collect()], key=key)
    want = sorted(rows, key=key)
    assert got == want


def test_unload_roundtrip_column_check():
    a = TableDesign(
        name="dw.t", source_name="CTAS",
        columns=[ColumnDefinition("x"), ColumnDefinition("y")],
    )
    b = TableDesign(
        name="reload.t", source_name="up.p.t",
        columns=[ColumnDefinition("x"), ColumnDefinition("z")],
    )
    with pytest.raises(DataUnloadError):
        validate_reload_columns(a, b)


def test_manifest_requires_success(tmp_path):
    d = tmp_path / "nodata"
    d.mkdir()
    with pytest.raises(MissingRelationError):
        write_manifest(str(d))


def test_monitor_events_and_summary(tmp_path):
    store = EventStore(str(tmp_path / "events.jsonl"))
    with Monitor(store, "src.orders", "load") as m:
        m.rowcount = 42
    with pytest.raises(ValueError):
        with Monitor(store, "src.lineitem", "load"):
            raise ValueError("boom")
    events = store.events()
    assert [e["event"] for e in events] == ["start", "finish", "start", "fail"]
    assert store.latest_finish("src.orders", "load")["rowcount"] == 42
    summary = store.summarize()
    by = {(s["step"], s["event"]): s for s in summary}
    assert by[("load", "finish")]["rows"] == 42
    assert len(store.tail(2)) == 2
    assert store.query(target="src.orders") and not store.query(target="nope.x")


def test_unload_order_by_produces_globally_ordered_files(spark, tmp_path):
    import glob as g
    import gzip

    from arthur_redshift_etl_spark.sinks.unload import unload
    from arthur_redshift_etl_spark.workload import t as load_table

    path = str(tmp_path / "ordered-unload")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey"
    ).repartition(8)
    unload(orders, path, allow_overwrite=True, order_by=["o_orderkey"])
    keys = []
    for f in sorted(g.glob(path + "/part-*.csv.gz")):
        with gzip.open(f, "rt") as fh:
            keys.extend(int(line.strip().strip('"')) for line in fh if line.strip())
    assert len(keys) == orders.count()
    assert keys == sorted(keys)  # file-name order == global key order


def test_read_source_schema_evolution_added_column(spark, tmp_path):
    """A lake location whose later part files added a column must read
    cleanly under the design schema: early files yield NULL for the new
    column (per-file name-based reconciliation), no mergeSchema pass —
    the design schema IS the contract, exactly like COPY into a table
    whose DDL already has the column."""
    from pyspark.sql import types as T

    from arthur_redshift_etl_spark.sources.files import read_source

    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)

    design = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    rows = {
        r["id"]: (r["name"], r["score"])
        for r in read_source(spark, d, "parquet", schema=design).collect()
    }
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_orc_read_source_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is a first-class columnar source: full type zoo survives a
    write/read round trip through read_source, and filters reach the ORC
    scan (native datasource, same pushdown path as parquet)."""
    rows = [
        (1, None, 1.5, True, "plain", datetime.date(2020, 1, 2),
         datetime.datetime(2021, 3, 4, 5, 6, 7)),
        (2, 7, None, False, "comma, quoted \"x\"", None, None),
        (3, -1, 2.25, None, None, datetime.date(1999, 12, 31), None),
    ]
    schema = (
        "id long, an_int int, a_double double, a_boolean boolean, "
        "a_text string, a_date date, a_timestamp timestamp"
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "orc_zoo")
    df.write.orc(path)

    back = read_source(spark, path, "orc")
    key = lambda r: tuple(repr(x) for x in r)  # noqa: E731 — None-safe sort
    assert sorted([tuple(r) for r in back.collect()], key=key) == sorted(
        rows, key=key
    )

    filtered = back.filter(back.id > 1).select("id", "an_int")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan" in plan, plan

    with pytest.raises(ValueError):
        read_source(spark, path, "feather")


def test_follow_offset_gap_and_truncation(tmp_path):
    """follow(from_offset=...) picks up events appended between the offset
    snapshot and the follow loop, and a truncated/rotated log resets the
    byte offset instead of stalling past EOF forever."""
    path = str(tmp_path / "events.jsonl")
    store = EventStore(path)
    store.append({"event": "start", "target": "a.t", "step": "load"})
    offset = store.offset()
    # appended AFTER the snapshot but BEFORE the follow loop begins — the
    # regression had follow() snapshot its own position and skip this one
    store.append({"event": "finish", "target": "a.t", "step": "load"})
    seen = [
        e["event"]
        for e in store.follow(poll_interval=0.05, timeout=0.3, from_offset=offset)
    ]
    assert "finish" in seen and "start" not in seen

    # rotation: the log was replaced and is now SMALLER than the follow's
    # offset — the follow must reset to the start instead of seeking past
    # EOF and silently yielding nothing forever
    with open(path, "w") as fh:
        fh.write("")
    store.append({"event": "after-rotate", "target": "a.t", "step": "load"})
    oversized = os.path.getsize(path) + 1000
    seen2 = [
        e["event"]
        for e in store.follow(
            poll_interval=0.05, timeout=0.3, from_offset=oversized
        )
    ]
    assert "after-rotate" in seen2

    # same-size rotation leaves the offset mid-line: the fragment is
    # skipped, the follow survives, and later whole lines still arrive
    frag_offset = 5
    seen3 = [
        e["event"]
        for e in store.follow(
            poll_interval=0.05, timeout=0.3, from_offset=frag_offset
        )
    ]
    assert seen3 == []  # the fragment did not crash the follow


def test_tail_at_snapshot_excludes_later_appends(tmp_path):
    path = str(tmp_path / "events.jsonl")
    store = EventStore(path)
    store.append({"event": "one"})
    store.append({"event": "two"})
    offset = store.offset()
    store.append({"event": "three"})  # after the snapshot
    rows = store.tail_at(offset, 10)
    assert [r["event"] for r in rows] == ["one", "two"]
    # ...and the follow starting at the same snapshot delivers it once
    seen = [
        e["event"]
        for e in store.follow(poll_interval=0.05, timeout=0.3, from_offset=offset)
    ]
    assert seen == ["three"]


def test_tail_follow_byte_offsets_with_non_ascii_payloads(tmp_path):
    """Offsets are BYTE positions, so multi-byte UTF-8 payloads (e.g. a
    target named in another script, written by an external producer
    without ASCII escaping) must not shift the tail/follow handoff."""
    path = str(tmp_path / "events.jsonl")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('{"event": "début", "target": "sché.ma"}\n')
        fh.write('{"event": "中間", "target": "a.t"}\n')
    store = EventStore(path)
    offset = store.offset()
    assert offset == os.path.getsize(path)
    rows = store.tail_at(offset, 10)
    assert [r["event"] for r in rows] == ["début", "中間"]
    # append a third after the snapshot: exactly-once handoff must hold
    with open(path, "a", encoding="utf-8") as fh:
        fh.write('{"event": "après"}\n')
    seen = [
        e["event"]
        for e in store.follow(poll_interval=0.05, timeout=0.3, from_offset=offset)
    ]
    assert seen == ["après"]
