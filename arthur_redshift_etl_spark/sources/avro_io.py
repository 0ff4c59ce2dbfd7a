"""Distributed Avro read/write on top of the pure-Python codec.

Scale model:

- **Read**: ``spark.read.format("binaryFile")`` lists and splits the file
  set across executors (one task per .avro part file); each task decodes its
  file with ``avro_codec`` inside ``mapInPandas`` and hands Arrow batches
  back to the JVM.  The driver only reads ONE file header (bytes, not rows)
  to learn the schema — data never flows through the driver.  Avro OCF is
  not block-splittable without the sync-scan the jar implements, so the
  parallelism unit is the file — the same granularity Sqoop/COPY produce
  (many part files per relation), which is what the reference's file sets
  look like (``file_sets.py:60-105``).

- **Write**: each input partition encodes itself to one ``part-NNNNN-*.avro``
  file from inside ``mapInPandas`` (executor-side, Arrow-batched; the task
  writes to the shared filesystem exactly like a DataSource task writer),
  then the driver commits the ``_SUCCESS`` marker after the job succeeds.
  Failed/retried tasks leave orphan temp names behind only until the final
  rename — each task writes to ``.inprogress-<uuid>`` and renames once its
  iterator is exhausted, so a killed task never leaves a half file that a
  reader would pick up (part-* glob misses dotfiles).

Python cost: this is the one deliberately Python-batch path besides the
multimodal codec stubs — there is no JVM Avro datasource in this
environment.  Encode/decode is per-byte Python, so throughput is bounded
(~10-50 MB/s/core); with the jar present ``read_source`` never reaches this
fallback (it tries the built-in ``avro`` format first).
"""

from __future__ import annotations

import glob
import os
import uuid
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import avro_codec
from ..errors import MissingRelationError


def _first_avro_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    candidates = sorted(
        glob.glob(os.path.join(path, "part-*.avro"))
        or glob.glob(os.path.join(path, "*.avro"))
    )
    if not candidates:
        raise MissingRelationError(f"no .avro files under {path}")
    return candidates[0]


def _to_pandas_columns(rows, schema: T.StructType):
    """Row tuples → dict of per-column lists (Arrow-friendly objects)."""
    cols = {f.name: [] for f in schema.fields}
    names = [f.name for f in schema.fields]
    for row in rows:
        for name, value in zip(names, row):
            cols[name].append(value)
    return cols


def read_avro(
    spark: SparkSession, path: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """Read an Avro file/directory into a DataFrame without the jar."""
    import pandas as pd

    if schema is None:
        probe = _first_avro_file(path)
        with open(probe, "rb") as fh:
            # headers are < a few KiB; 1 MiB covers pathological doc schemas
            avro_schema, _, _, _ = avro_codec.read_header(fh.read(1 << 20))
        schema = avro_codec.spark_schema_from_avro(avro_schema)

    load_path = path
    if os.path.isdir(path):
        load_path = os.path.join(path, "*.avro")
    files = spark.read.format("binaryFile").load(load_path)

    result_schema = schema

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = avro_codec.read_container(bytes(content))
                yield pd.DataFrame(
                    _to_pandas_columns(rows, result_schema),
                    columns=[f.name for f in result_schema.fields],
                )

    return files.select("content").mapInPandas(decode, schema=result_schema)


def _series_to_values(series, field: T.StructField):
    """One pandas column → list of codec-ready Python objects."""
    import pandas as pd

    dt = field.dataType
    out = []
    for v in series:
        if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
            out.append(None)
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)) and isinstance(
            v, pd.Timestamp
        ):
            out.append(v.to_pydatetime())
        elif isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
            out.append(int(v))
        elif isinstance(dt, T.ArrayType) and not isinstance(v, list):
            out.append(list(v))
        else:
            out.append(v)
    return out


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """Write a DataFrame as part-*.avro files + _SUCCESS; returns row count."""
    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)
    schema = df.schema
    avro_schema = avro_codec.avro_schema_from_spark(schema)
    fields = list(schema.fields)

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(path, f".inprogress-{uuid.uuid4().hex}")
        final = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro")
        total = 0
        with open(tmp, "wb") as fh:

            def row_iter():
                nonlocal total
                for pdf in batches:
                    columns = [
                        _series_to_values(pdf[f.name], f) for f in fields
                    ]
                    for row in zip(*columns):
                        total += 1
                        yield row

            avro_codec.write_container(fh, row_iter(), avro_schema, codec=codec)
        if total:
            os.replace(tmp, final)
        else:
            os.remove(tmp)
        yield pd.DataFrame({"rows": [total]})

    counts = df.mapInPandas(encode, schema="rows long").collect()
    n = sum(r["rows"] for r in counts)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return n
