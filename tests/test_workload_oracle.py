"""Oracle-parity harness: every workload query vs DuckDB on the same parquet.

Mirrors the driver's correctness gate: row count + column names + order-
insensitive value comparison.  Runs at sf0.001 by default for speed (the
driver runs sf0.01).
"""

import math
import os

import duckdb
import pytest

from arthur_redshift_etl_spark import workload

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.10g}"
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def as_sorted_rows(colnames, rows):
    return sorted(tuple(normalize(v) for v in row) for row in rows)


@pytest.mark.parametrize("name", sorted(workload.oracles().keys()))
def test_query_matches_oracle(spark, duck, name):
    spec = workload.REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = [f.name for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_sorted = as_sorted_rows(spark_cols, spark_rows)
    d_sorted = as_sorted_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
