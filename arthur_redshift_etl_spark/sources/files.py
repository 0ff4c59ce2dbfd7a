"""File-format readers matching the reference's per-schema data formats.

Reference parity: ``config/dw.py:33-50`` (S3DataFormat: CSV/AVRO/JSON +
compression), COPY format options ``dialect/redshift.py:297-315`` (CSV with
delimiter ',', escape backslash, quotes, gzip; ``NULL AS '\\N'``), file-set
layout ``file_sets.py:60-105`` (part-* files, ``_SUCCESS`` sentinel,
``columns.yaml`` sidecar, ``.manifest``).
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..design import TableDesign
from ..errors import MissingRelationError

logger = logging.getLogger(__name__)

NULL_MARKER = "\\N"  # Redshift NULL AS marker (dialect/redshift.py:563)

CSV_READ_OPTIONS = {
    "sep": ",",
    "quote": '"',
    "escape": "\\",
    "nullValue": NULL_MARKER,
    "emptyValue": "",
    "multiLine": "true",  # embedded newlines in quoted fields
    "header": "false",
}

CSV_WRITE_OPTIONS = {
    "sep": ",",
    "quote": '"',
    "escape": "\\",
    "nullValue": NULL_MARKER,
    "emptyValue": "",
    "quoteAll": "true",  # UNLOAD ... ADDQUOTES (dialect/redshift.py:560)
    "compression": "gzip",
    "header": "false",
}


def success_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def has_success_marker(path: str) -> bool:
    return os.path.exists(success_marker(path))


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Optional[T.StructType] = None,
    require_success: bool = False,
) -> DataFrame:
    """Read a source relation's data files in the configured format."""
    if require_success and os.path.isdir(path) and not has_success_marker(path):
        raise MissingRelationError(f"no _SUCCESS marker under {path}")
    fmt = fmt.lower()
    avro_dir = path
    if fmt in ("csv", "json", "avro") and os.path.isdir(path):
        # only data files — the directory also holds _SUCCESS/columns.yaml
        path = os.path.join(path, "part-*")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.options(**CSV_READ_OPTIONS).csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "avro":
        try:
            df = reader.format("avro").load(path)
            df.schema  # force datasource resolution now, not at action time
            return df
        except Exception as exc:
            # Fall back to the pure-Python OCF codec (sources/avro_io.py)
            # ONLY when the builtin datasource is absent (no spark-avro jar
            # in this environment).  Any other failure — corrupt file, bad
            # glob, permissions — means the jar IS present and really
            # failed; re-raise so the true error surfaces instead of being
            # masked by an unrelated codec error or silently different data.
            msg = str(exc)
            if not (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find data source" in msg
                or "Failed to find the data source" in msg
            ):
                raise
            logger.info(
                "spark-avro datasource not available; using pure-Python "
                "OCF codec fallback for %s",
                avro_dir,
            )
            from .avro_io import read_avro

            return read_avro(spark, avro_dir, schema=schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        # Built-in columnar alternative to parquet (native Spark datasource,
        # same predicate-pushdown / column-pruning path).  The reference
        # never reads ORC, but lake sources routinely hold it; directory
        # reads keep Spark's own part-file discovery (ORC dirs carry no
        # sidecars that would confuse the glob).
        return reader.orc(path)
    raise ValueError(f"unsupported source format: {fmt}")


def apply_design_schema(df: DataFrame, design: TableDesign) -> DataFrame:
    """Cast/align a raw DataFrame to the design's declared schema.

    This is the COPY-side contract: column order and types come from the
    design, and varchar length limits truncate like TRUNCATECOLUMNS
    (dialect/redshift.py:348; SURVEY §7.5).
    """
    from pyspark.sql import functions as F

    cols = []
    for c in design.unskipped_columns:
        col = F.col(c.name).cast(c.spark_type())
        limit = c.varchar_length
        if limit is not None:
            col = F.substring(col, 1, limit)
        cols.append(col.alias(c.name))
    return df.select(cols)


def list_part_files(path: str) -> List[str]:
    """Data files of a written relation directory (part-*), sorted."""
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and not f.endswith(".crc")
    )


def write_manifest(path: str) -> str:
    """COPY-style manifest listing data files (extract/extractor.py:203-260).

    Requires the ``_SUCCESS`` marker — same guard as the reference.
    """
    if not has_success_marker(path):
        raise MissingRelationError(f"refusing to manifest {path}: no _SUCCESS")
    entries = [
        {"url": p, "mandatory": True} for p in list_part_files(path)
    ]
    manifest_path = path.rstrip("/") + ".manifest"
    with open(manifest_path, "w") as fh:
        json.dump({"entries": entries}, fh, indent=2, sort_keys=True)
    return manifest_path


def read_manifest(manifest_path: str) -> List[str]:
    with open(manifest_path) as fh:
        doc = json.load(fh)
    return [e["url"] for e in doc.get("entries", [])]
