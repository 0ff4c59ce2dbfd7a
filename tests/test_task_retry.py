"""Task-attempt failure injection: retried Arrow tasks neither lose nor
duplicate rows.

The engine's Python-boundary operators (mapInPandas/applyInPandas) run as
tasks that Spark retries on failure (`spark.task.maxFailures`, cluster
default 4).  The property that makes that safe is per-task idempotency:
a re-attempt re-reads its input split from scratch and its first
attempt's partial output is discarded, so downstream sees exactly-once
rows.  This pins that property with an injected first-attempt failure —
the class of transient (OOM-killed executor, spot reclaim, flaky disk)
the 100 TB deployment sees hourly.

Runs in a subprocess: task retries need a `local[N, maxFailures]` master,
and the shared test session is plain local[4] (maxFailures=1, where any
task failure kills the job — also pinned below, because silently
different local-vs-cluster retry behavior is worth knowing about).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession
from pyspark import TaskContext
from pyspark.sql import functions as F

retries_allowed = sys.argv[1] == "retry"
marker_dir = sys.argv[2]
master = "local[2, 2]" if retries_allowed else "local[2]"
spark = (
    SparkSession.builder.master(master)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def transform(batches):
    tc = TaskContext.get()
    inject = tc.partitionId() == 1 and tc.attemptNumber() == 0
    first = True
    for pdf in batches:
        if inject and first:
            # fail AFTER emitting a batch on attempt 0: the partial output
            # must be discarded by the retry, or downstream double-counts.
            # Accumulators from failed attempts are dropped by design, so
            # the injection proof is an os-level marker file instead.
            import os
            open(os.path.join(marker_dir, f"inj_{tc.partitionId()}_{tc.attemptNumber()}"), "w").close()
            yield pdf.assign(doubled=pdf["id"] * 2)
            raise RuntimeError("injected task failure (attempt 0)")
        first = False
        yield pdf.assign(doubled=pdf["id"] * 2)

df = spark.range(0, 1000, 1, 4)
out = df.mapInPandas(transform, "id long, doubled long")
try:
    rows = out.collect()
    agg = {
        "ok": True,
        "n": len(rows),
        "distinct": len({r.id for r in rows}),
        "sum_doubled": sum(r.doubled for r in rows),
    }
except Exception as e:
    agg = {"ok": False, "error": type(e).__name__}
import os
agg["injections"] = len(os.listdir(marker_dir))
print("RESULT:" + json.dumps(agg))
"""


def _run(mode: str, tmp_path) -> dict:
    marker = str(tmp_path / f"markers-{mode}")
    os.makedirs(marker, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, mode, marker],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise AssertionError(f"no RESULT line\nstdout={proc.stdout}\nstderr={proc.stderr[-2000:]}")


@pytest.mark.slow
def test_retried_task_neither_loses_nor_duplicates(tmp_path):
    res = _run("retry", tmp_path)
    assert res["ok"], res
    assert res["injections"] >= 1, "failure was never injected"
    assert res["n"] == 1000
    assert res["distinct"] == 1000  # the pre-failure partial batch was discarded
    assert res["sum_doubled"] == sum(i * 2 for i in range(1000))


@pytest.mark.slow
def test_single_attempt_local_mode_fails_the_job(tmp_path):
    res = _run("nofail", tmp_path)
    assert not res["ok"], res
    assert res["injections"] >= 1

WRITER_ABORT_SCRIPT = r"""
import json, os, sys, time
from pyspark.sql import SparkSession
from pyspark import TaskContext

db = sys.argv[1]

import duckdb
con = duckdb.connect(db)
con.execute("CREATE TABLE t AS SELECT range AS id FROM range(0, 7)")
con.close()

spark = (
    SparkSession.builder.master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, os.getcwd())
from arthur_redshift_etl_spark.sources.duckdb_source import register_duckdb_source
register_duckdb_source(spark)

def gen(batches):
    tc = TaskContext.get()
    for pdf in batches:
        if tc.partitionId() == 1:
            raise RuntimeError("injected failure (both attempts)")
        # partition 0: the zombie — keep draining batches slowly so the
        # driver's abort() races its staged writes
        time.sleep(0.05)
        yield pdf

df = spark.range(0, 1000, 1, 2).mapInPandas(gen, "id long")
ok = True
try:
    (df.write.format("duckdb").option("path", db).option("table", "t")
       .mode("append").save())
except Exception:
    ok = False
spark.stop()  # workers dead: no further staging writes possible

staging_base = db + ".staging"
litter = []
if os.path.isdir(staging_base):
    for root, dirs, files in os.walk(staging_base):
        litter.extend(os.path.join(root, f) for f in files)
con = duckdb.connect(db)
n = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
con.close()
print("RESULT:" + json.dumps({
    "write_failed": not ok, "litter": litter, "table_rows": n,
}))
"""


@pytest.mark.slow
def test_writer_abort_races_draining_zombie_task(tmp_path):
    """DuckDBWriter.abort under a real draining zombie: one task fails
    both attempts (job abort) while the other is mid-write — the
    poll-until-gone abort must leave zero staging litter and the target
    table byte-identical."""
    db = str(tmp_path / "abortrace.duckdb")
    proc = subprocess.run(
        [sys.executable, "-c", WRITER_ABORT_SCRIPT, db],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    res = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            res = json.loads(line[len("RESULT:"):])
    assert res is not None, (
        f"no RESULT line\nstdout={proc.stdout}\nstderr={proc.stderr[-2000:]}"
    )
    assert res["write_failed"], res  # the job really aborted
    assert res["litter"] == [], res  # no staged files survive the abort
    assert res["table_rows"] == 7, res  # table untouched
