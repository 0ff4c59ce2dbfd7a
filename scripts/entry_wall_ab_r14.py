"""Interleaved wall A/B of catalog entries between two checkouts.

Usage:
    python scripts/entry_wall_ab_r14.py <before_repo> <after_repo> <entry> [...]

For each entry: REPS interleaved (before, after) timings in fresh
subprocesses (fn() + count, which includes eager work like the CC loop),
printed as JSON.  Subprocess-per-measurement so neither checkout's module
state or JVM warmth leaks into the other; interleaving bounds host-noise
drift.  Effects measured this way should be >= 1.5x to be believed on this
box (see OPTIMIZATION_r14.md host-noise section).
"""

import json
import os
import subprocess
import sys
import time

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r"""
import sys, time
repo, entry, sf = sys.argv[1:4]
sys.path.insert(0, repo)
from arthur_redshift_etl_spark import workload
from arthur_redshift_etl_spark.session import build_session
spark = build_session("wall-ab", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM/session on an unrelated light query so the timed region is
# the entry, not session startup
workload.REGISTRY["q06_forecast_revenue"].fn(spark, sf).collect()
t0 = time.perf_counter()
df = workload.REGISTRY[entry].fn(spark, sf)
n = df.count()
print(f"WALL {time.perf_counter() - t0:.3f} ROWS {n}")
spark.stop()
"""


def one(repo: str, entry: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, entry, SF],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "PYTHONPATH": repo},
        cwd=repo,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALL"):
            return float(line.split()[1])
    raise RuntimeError(f"{entry} in {repo}: no WALL line\n{out.stderr[-2000:]}")


def main() -> None:
    before, after = sys.argv[1], sys.argv[2]
    entries = sys.argv[3:]
    res = {}
    for entry in entries:
        walls = {"before": [], "after": []}
        for rep in range(REPS):
            order = (
                [("before", before), ("after", after)]
                if rep % 2 == 0
                else [("after", after), ("before", before)]
            )
            for side, repo in order:
                w = one(repo, entry)
                walls[side].append(w)
                print(f"# {entry} {side} rep{rep}: {w:.3f}s", flush=True)
        res[entry] = {
            "before": walls["before"],
            "after": walls["after"],
            "median_before": sorted(walls["before"])[len(walls["before"]) // 2],
            "median_after": sorted(walls["after"])[len(walls["after"]) // 2],
        }
        res[entry]["speedup"] = round(
            res[entry]["median_before"] / res[entry]["median_after"], 3
        )
        print(json.dumps({entry: res[entry]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
