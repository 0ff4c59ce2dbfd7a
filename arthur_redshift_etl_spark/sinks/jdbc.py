"""JDBC write-back sink: export warehouse relations to an operational DB.

The reverse of the extract path (SURVEY §2.1): after the warehouse builds,
serving systems often want a compact result table back in Postgres/MySQL.
``df.write.jdbc`` handles the protocol; this wraps it with the engine's
conventions — explicit write partitioning (each partition opens one
connection and streams batched INSERTs), retry with transient
classification, and a row-count audit.

Scale notes: the receiving database is the bottleneck, not Spark.
``num_partitions`` caps concurrent connections (reference caps extract
partitions the same way); ``batchsize`` amortizes round-trips.  Only export
aggregate-sized relations — shipping a fact table over JDBC is an
anti-pattern the reference also avoided (it published via S3/COPY).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ..retry import call_with_retry


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 1000,
    num_partitions: Optional[int] = None,
    properties: Optional[dict] = None,
    retries: int = 3,
) -> int:
    """Write ``df`` to a JDBC table; returns the exported row count."""
    out = df.repartition(num_partitions) if num_partitions else df
    props = {"batchsize": str(batchsize), **(properties or {})}

    def attempt() -> None:
        out.write.mode(mode).options(**props).jdbc(url, table)

    call_with_retry(retries, attempt)
    return df.count()
