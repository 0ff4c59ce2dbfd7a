"""Avro I/O: pure-Python Object Container File codec + distributed read/write.

Reference parity: AVRO is a first-class per-schema source format in the
reference (``config/dw.py:33-50``; COPY ``FORMAT AS AVRO``
``dialect/redshift.py:297-315``).  No spark-avro jar ships in this
environment, so these tests exercise the spec-level codec
(``sources/avro_codec.py``) and the binaryFile+mapInPandas plumbing
(``sources/avro_io.py``) — same adversarial type zoo as the CSV round-trip.
"""

import datetime
import decimal
import io

import pytest
from pyspark.sql import types as T

from arthur_redshift_etl_spark.sources import avro_codec
from arthur_redshift_etl_spark.sources.avro_io import read_avro, write_avro
from arthur_redshift_etl_spark.sources.files import read_source

ZOO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("an_int", T.IntegerType(), True),
        T.StructField("a_double", T.DoubleType(), True),
        T.StructField("a_numeric", T.DecimalType(20, 4), True),
        T.StructField("a_boolean", T.BooleanType(), True),
        T.StructField("a_text", T.StringType(), True),
        T.StructField("a_date", T.DateType(), True),
        T.StructField("a_timestamp", T.TimestampNTZType(), True),
        T.StructField("a_binary", T.BinaryType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

ZOO_ROWS = [
    (1, 10, 1.5, decimal.Decimal("1234.5678"), True, None,
     datetime.date(2020, 1, 2), datetime.datetime(2020, 1, 2, 3, 4, 5),
     b"\x00\xffbin", ["a", "b"]),
    (2, None, None, None, False, "", None, None, b"", []),
    (3, 0, -2.25, decimal.Decimal("0.0001"), None, '"quote, comma\nnewline',
     None, None, None, None),
    (4, -5, 3.0, decimal.Decimal("-99999999.9999"), True, "unicode é中\U0001f600",
     datetime.date(1969, 7, 20), datetime.datetime(1969, 7, 20, 20, 17, 40, 123456),
     None, ["x"]),
    (5, 2**31 - 1, 5e-324, None, False, "\\N literal backslash-N", None, None,
     bytes(range(256)), None),
]


def test_codec_roundtrip_pure_python():
    """Spec-level: encode → decode without Spark, deflate codec."""
    avro_schema = avro_codec.avro_schema_from_spark(ZOO_SCHEMA)
    buf = io.BytesIO()
    n = avro_codec.write_container(buf, ZOO_ROWS, avro_schema, codec="deflate",
                                   block_rows=2)  # force multiple blocks
    assert n == len(ZOO_ROWS)
    schema_back, rows = avro_codec.read_container(buf.getvalue())
    assert schema_back == avro_schema
    assert rows == ZOO_ROWS


def test_codec_null_codec_and_negative_block_counts():
    avro_schema = avro_codec.avro_schema_from_spark(ZOO_SCHEMA)
    buf = io.BytesIO()
    avro_codec.write_container(buf, ZOO_ROWS, avro_schema, codec="null")
    _, rows = avro_codec.read_container(buf.getvalue())
    assert rows == ZOO_ROWS


def test_codec_rejects_corrupt_sync():
    avro_schema = avro_codec.avro_schema_from_spark(ZOO_SCHEMA)
    buf = io.BytesIO()
    avro_codec.write_container(buf, ZOO_ROWS, avro_schema)
    data = bytearray(buf.getvalue())
    data[-1] ^= 0xFF  # trailing sync marker byte
    with pytest.raises(avro_codec.AvroCodecError):
        avro_codec.read_container(bytes(data))


def test_schema_mapping_roundtrip():
    avro_schema = avro_codec.avro_schema_from_spark(ZOO_SCHEMA)
    back = avro_codec.spark_schema_from_avro(avro_schema)
    assert [f.name for f in back.fields] == [f.name for f in ZOO_SCHEMA.fields]
    assert [f.dataType for f in back.fields] == [f.dataType for f in ZOO_SCHEMA.fields]


def test_spark_write_read_roundtrip(spark, tmp_path):
    """Distributed path: mapInPandas encode → binaryFile + mapInPandas decode."""
    df = spark.createDataFrame(ZOO_ROWS, ZOO_SCHEMA).repartition(3)
    path = str(tmp_path / "zoo_avro")
    n = write_avro(df, path)
    assert n == len(ZOO_ROWS)
    import os

    parts = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(parts) == 3  # one file per partition
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    back = read_avro(spark, path)
    assert back.schema == ZOO_SCHEMA
    key = lambda r: tuple(repr(x) for x in r)  # noqa: E731
    got = sorted([tuple(r) for r in back.collect()], key=key)
    want = sorted(ZOO_ROWS, key=key)
    assert got == want


def test_read_source_avro_fallback(spark, tmp_path):
    """read_source(fmt='avro') lands on the codec when the jar is absent."""
    df = spark.createDataFrame(ZOO_ROWS, ZOO_SCHEMA)
    path = str(tmp_path / "src_avro")
    write_avro(df, path)
    back = read_source(spark, path, "avro", require_success=True)
    assert back.count() == len(ZOO_ROWS)
    assert set(back.columns) == {f.name for f in ZOO_SCHEMA.fields}


def test_timestamp_tz_micros(spark, tmp_path):
    """TimestampType (UTC session) round-trips as timestamp-micros."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ])
    rows = [(1, datetime.datetime(2021, 6, 1, 12, 30, 15, 987654)), (2, None)]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "ts_avro")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema["ts"].dataType == T.TimestampType()
    got = sorted(back.collect(), key=lambda r: r["id"])
    assert got[0]["ts"] == rows[0][1]
    assert got[1]["ts"] is None


def test_empty_partitions_leave_no_files(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long").repartition(8)
    path = str(tmp_path / "sparse_avro")
    n = write_avro(df, path)
    assert n == 1
    import os

    files = os.listdir(path)
    assert not any(f.startswith(".inprogress") for f in files)
    assert sum(1 for f in files if f.endswith(".avro")) == 1
    assert read_avro(spark, path).count() == 1


def _builtin_avro_available(spark):
    try:
        spark.read.format("avro").load("/nonexistent-path-probe").schema
    except Exception as exc:
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg:
            return False
    return True


def test_builtin_jar_branch_parity(spark, tmp_path):
    """When spark-avro IS present, read_source must return the same rows
    through the builtin datasource as through the codec fallback — keeps
    both branches honest (skips where the jar is absent, as in this env)."""
    if not _builtin_avro_available(spark):
        pytest.skip("spark-avro jar not on the classpath")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None)], "id long, s string, x double"
    )
    path = str(tmp_path / "parity_avro")
    write_avro(df, path)
    via_jar = read_source(spark, path, fmt="avro")
    via_codec = read_avro(spark, path)
    assert sorted(map(tuple, via_jar.collect())) == sorted(
        map(tuple, via_codec.collect())
    )


def test_fallback_reraises_non_missing_datasource_errors(spark, tmp_path):
    """A corrupt file with the jar present must surface the jar's error,
    not be silently re-routed through the codec (ADVICE r2)."""
    if _builtin_avro_available(spark):
        bad = tmp_path / "corrupt"
        bad.mkdir()
        (bad / "part-00000.avro").write_bytes(b"Obj\x01garbage-not-avro")
        with pytest.raises(Exception) as exc_info:
            read_source(spark, str(bad), fmt="avro").collect()
        assert "AvroCodecError" not in str(exc_info.value)
    else:
        # jar absent: the fallback engages only for DATA_SOURCE_NOT_FOUND
        df = spark.createDataFrame([(1,)], "id long")
        path = str(tmp_path / "ok_avro")
        write_avro(df, path)
        assert read_source(spark, path, fmt="avro").count() == 1


def test_write_commit_sweeps_stale_inprogress(spark, tmp_path):
    """Leftover temp files from unacknowledged task attempts (speculation,
    stage retry) must be swept by the driver commit, never published."""
    import os

    path = tmp_path / "committed_avro"
    path.mkdir()
    # simulate a dead attempt's orphan from a PREVIOUS failed job
    (path / ".inprogress-deadbeef").write_bytes(b"partial garbage")
    df = spark.createDataFrame([(i,) for i in range(10)], "id long").repartition(4)
    n = write_avro(df, str(path))
    assert n == 10
    files = os.listdir(path)
    assert not any(f.startswith(".inprogress") for f in files)
    assert read_avro(spark, str(path)).count() == 10
    # exactly one published part per non-empty partition
    parts = [f for f in files if f.endswith(".avro")]
    assert 1 <= len(parts) <= 4


def test_read_with_schema_assembles_columns_by_name(spark, tmp_path):
    """A file whose field order differs from the requested schema must come
    back correctly by NAME; a field-set mismatch must raise (ADVICE r2)."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    path = str(tmp_path / "reorder_avro")
    write_avro(df, path)
    # request the REVERSED column order
    want = T.StructType(
        [T.StructField("b", T.StringType()), T.StructField("a", T.LongType())]
    )
    got = sorted(read_avro(spark, path, schema=want).collect())
    assert [tuple(r) for r in got] == [("x", 1), ("y", 2)]
    # missing field → loud error
    bad = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("nope", T.StringType())]
    )
    with pytest.raises(Exception) as exc_info:
        read_avro(spark, path, schema=bad).collect()
    assert "missing" in str(exc_info.value)


def test_rewrite_replaces_previous_dataset(spark, tmp_path):
    """Writing into a directory that already holds a committed dataset must
    replace it, never union with it."""
    path = str(tmp_path / "rewrite_avro")
    write_avro(spark.createDataFrame([(i,) for i in range(50)], "id long"), path)
    n = write_avro(spark.createDataFrame([(99,)], "id long"), path)
    assert n == 1
    got = read_avro(spark, path).collect()
    assert [r["id"] for r in got] == [99]
