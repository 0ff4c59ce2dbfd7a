"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``arthur_redshift_etl_spark.workload`` (one entry per implemented operator
from SURVEY.md §2 plus the scale-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arthur_redshift_etl_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracles()
