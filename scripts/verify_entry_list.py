"""Oracle-verify a named list of catalog entries at one or more SFs.

Usage:
  python scripts/verify_entry_list.py entry1,entry2 [sf_dir ...]

Same value protocol as scripts/driver_sim.py (floats at 10 significant
digits, ISO timestamps, sorted tuples); defaults to sf0.001 AND sf0.01 so a
targeted re-verification after touching an entry covers both driver scales.
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
    names = sys.argv[1].split(",")
    sfs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = mod.queries()
    o = mod.oracle_sql()
    bad = []
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES.split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            try:
                srows = sorted(
                    tuple(norm(x) for x in r) for r in q[name](spark, sf).collect()
                )
                orows = sorted(
                    tuple(norm(x) for x in r)
                    for r in con.execute(o[name]).fetchall()
                )
                ok = srows == orows
                status = "MATCH" if ok else f"MISMATCH {len(srows)} vs {len(orows)}"
                if not ok:
                    bad.append((sf, name))
            except Exception as ex:  # noqa: BLE001
                status = f"ERROR {str(ex)[:100]}"
                bad.append((sf, name))
            print(f"{sf} {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
        con.close()
    print(f"bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
