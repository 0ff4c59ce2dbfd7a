"""Simulate the round driver's correctness pass: first-50 rotated entries,
sf0.01, DuckDB oracle compare under the driver's value protocol (floats at
10 significant digits, ISO timestamps).

Run before each round ends: `python scripts/driver_sim.py` — a MISMATCH
here is a red CORRECTNESS row tomorrow.
"""

import importlib.util
import math
import sys
import time

import duckdb

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    q = mod.queries()
    o = mod.oracle_sql()
    bad = []
    t0 = time.time()
    for name in list(q)[:n]:
        try:
            srows = sorted(
                tuple(norm(x) for x in r) for r in q[name](spark, sf).collect()
            )
            if name in o:
                orows = sorted(
                    tuple(norm(x) for x in r)
                    for r in con.execute(o[name]).fetchall()
                )
                status = "OK" if srows == orows else f"MISMATCH {len(srows)} vs {len(orows)}"
                if srows != orows:
                    bad.append(name)
            else:
                status = f"rows-only {len(srows)}"
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {str(ex)[:80]}"
            bad.append(name)
        print(f"{name}: {status}", flush=True)
    print(f"TOTAL {time.time() - t0:.0f}s  bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
