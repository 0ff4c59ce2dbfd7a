#!/usr/bin/env python3
"""Arrow batch-size sensitivity: the Python-boundary magic constant test.

The session pins ``spark.sql.execution.arrow.maxRecordsPerBatch=10000``
(session.py) — every mapInPandas / pandas_udf operator inherits it. Like
the shuffle-partition sweep, this asks whether the engine is secretly
tuned to that constant: per setting (1k / 10k / 100k rows), a warm
min-of-3 of the three heaviest Python-boundary entries at sf0.1:

  knn_gemm_topk    — BLAS matmul per Arrow batch: tiny batches = many
                     tiny GEMMs (per-call overhead), huge batches =
                     better BLAS shape but score-matrix memory grows as
                     batch x queries;
  text_token_stats — string-heavy pandas work, per-batch overhead is
                     regex compilation amortization;
  bpe_token_counts — the iterative encode loop, per-batch overhead
                     multiplied by merge rounds.

The conf is read per-execution (runtime-mutable), so one session sweeps
all settings. What transfers to 100 TB: per-batch fixed costs (Arrow
serialization setup, GEMM dispatch, regex compile) shrink relative to
batch size, but executor memory per in-flight batch grows linearly —
the right setting is the largest batch whose decoded payload fits the
per-task memory slice, and the measurement shows how much headroom the
default leaves.

Run ALONE (32-core contention trap):  python scripts/arrow_batch_sweep.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_SIZES = [1_000, 10_000, 100_000]
QUERIES = ["knn_gemm_topk", "text_token_stats", "bpe_token_counts"]
REPS = 3


def main() -> int:
    spark = build_session(
        app_name="arrow-batch-sweep",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        report = {"sf_dir": SF_DIR, "settings": {}}
        for name in QUERIES:  # warm plans/codegen/Python workers at default
            workload.REGISTRY[name].fn(spark, SF_DIR).count()
        for batch in BATCH_SIZES:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
            row = {}
            for name in QUERIES:
                workload.REGISTRY[name].fn(spark, SF_DIR).count()  # warm at setting
                walls = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    workload.REGISTRY[name].fn(spark, SF_DIR).count()
                    walls.append(time.perf_counter() - t0)
                row[name] = round(min(walls), 3)
            report["settings"][str(batch)] = row
            print(f"# batch={batch}: {row}", file=sys.stderr)
        out_path = os.environ.get("SPARK_GRAFT_ARROW_OUT")
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(report, fh)
        print(json.dumps(report))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
