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

- **Write**: each input partition encodes itself to a task-attempt-unique
  ``.inprogress-<uuid>`` temp file from inside ``mapInPandas``
  (executor-side, Arrow-batched) and reports ``(partition, temp_path,
  rows)`` back; the DRIVER then commits — renames exactly one winner per
  partition to ``part-NNNNN-*.avro``, sweeps every leftover
  ``.inprogress-*`` (losers from retried/speculative attempts), and only
  then writes ``_SUCCESS``.  Tasks never rename, so a task whose success is
  never acknowledged (executor lost, speculation, stage retry) cannot
  publish a duplicate part file: Spark's scheduler reports one winning
  attempt per partition to the driver, and everything else is swept.  This
  mirrors the Hadoop v2 commit protocol (task → attempt dir, driver →
  commitJob) on a shared filesystem; on object stores you would use the
  real committer via the jar datasource instead.

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

# The decode/encode closures run on executor Python workers, which may not
# have this package importable (driver loaded by file path from another
# cwd).  Ship the (stdlib-only) codec and this module's helpers by value
# with the pickled task instead of as import-by-name references.
try:  # pragma: no cover - safeguard when registration is unavailable
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(avro_codec)
    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


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


def read_avro(
    spark: SparkSession, path: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """Read an Avro file/directory into a DataFrame without the jar.

    When ``schema`` is given (e.g. the design schema from ``read_source``),
    each file is decoded with its OWN embedded writer schema and columns are
    assembled BY NAME into the requested schema — never positionally, so a
    file whose field order differs from the design cannot silently assign
    values to the wrong columns.  A field-set mismatch (missing or extra
    fields) raises instead of truncating.
    """
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

    wanted = [f.name for f in schema.fields]
    result_schema = schema

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                file_schema, rows = avro_codec.read_container(bytes(content))
                file_names = [f["name"] for f in file_schema["fields"]]
                if sorted(file_names) != sorted(wanted):
                    missing = sorted(set(wanted) - set(file_names))
                    extra = sorted(set(file_names) - set(wanted))
                    raise avro_codec.AvroCodecError(
                        f"{fpath}: avro field set does not match requested "
                        f"schema (missing={missing}, extra={extra})"
                    )
                index = [file_names.index(n) for n in wanted]
                cols = {
                    n: [row[i] for row in rows]
                    for n, i in zip(wanted, index)
                }
                yield pd.DataFrame(cols, columns=wanted)

    return (
        files.select("path", "content").mapInPandas(decode, schema=result_schema)
    )


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
    """Write a DataFrame as part-*.avro files + _SUCCESS; returns row count.

    Two-phase commit (see module docstring): tasks only produce
    attempt-unique ``.inprogress-*`` temp files and report them; the driver
    renames one winner per partition, sweeps the rest, then drops
    ``_SUCCESS``.  Retried or speculative task attempts therefore never
    yield duplicate part files.
    """
    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)
    # Overwrite semantics: a previous write's part files must not survive
    # into this one's _SUCCESS, or readers would see the union of two
    # datasets.  Remove prior parts + marker before launching the job.
    for stale in glob.glob(os.path.join(path, "part-*.avro")) + glob.glob(
        os.path.join(path, "_SUCCESS")
    ):
        os.remove(stale)
    schema = df.schema
    avro_schema = avro_codec.avro_schema_from_spark(schema)
    fields = list(schema.fields)

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(path, f".inprogress-{uuid.uuid4().hex}")
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
        if not total:
            os.remove(tmp)
            tmp = None
        yield pd.DataFrame({"part": [pid], "path": [tmp], "rows": [total]})

    reports = df.mapInPandas(
        encode, schema="part int, path string, rows long"
    ).collect()

    # Driver-side commit: Spark reports exactly one successful attempt per
    # partition; rename only those, in partition order, to the public names.
    n = 0
    for rep in sorted(reports, key=lambda r: r["part"]):
        if rep["path"] is None:
            continue  # empty partition — no file
        final = os.path.join(
            path, f"part-{rep['part']:05d}-{uuid.uuid4().hex[:8]}.avro"
        )
        os.replace(rep["path"], final)
        n += rep["rows"]
    # Sweep losers: temp files from attempts whose success was never
    # acknowledged (killed/speculative/retried tasks).
    for stale in glob.glob(os.path.join(path, ".inprogress-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return n
