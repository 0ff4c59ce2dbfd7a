#!/usr/bin/env python3
"""Memory-pressure A/B: the spill-not-OOM proof behind the 100 TB sizing rules.

On a production cluster every task gets a bounded slice of executor memory;
SCALE.md's sizing table claims the engine's partition strategy keeps the
heavy queries inside that slice OR lets them degrade gracefully by
spilling.  Until now that claim was unmeasured.  This script runs the
heaviest bench queries in fresh JVMs at an AMPLE heap and a CONSTRAINED
heap (default 6g vs 1g — with Spark's 300 MB reserve and 0.6 memory
fraction that is ~3.4 GB vs ~434 MB of unified memory, an ~8x cut) over
the engine-generated 10x fact tier (bench_scale_tier generator,
SPARK_GRAFT_SCALE_COPIES), and records per query:

  wall seconds, memory/disk bytes spilled (AppStatusStore stage totals via
  plans.metrics.stage_totals), and the driver-protocol %.10g row checksum.

PASS criteria, asserted by the parent:
  1. zero query failures at the constrained heap (no OOM);
  2. checksums identical across heaps (spilling never changes answers);
  3. nonzero disk spill at the constrained heap (the pressure was real —
     a run that never spilled proves nothing about degradation).

Run ALONE (32-core contention trap): python scripts/memory_stress.py
Env: SPARK_GRAFT_MEMSTRESS_HEAPS="6g,1g"  SPARK_GRAFT_SCALE_COPIES=10
     SPARK_GRAFT_MEMSTRESS_QUERIES=comma-list override
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
TIER_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_TIER_DIR", f"/tmp/spark_graft_sf{COPIES / 10:g}"
)
HEAPS = os.environ.get("SPARK_GRAFT_MEMSTRESS_HEAPS", "6g,1g").split(",")

# The bench queries that move the most bytes through sort/agg/join/window
# state at the 10x tier.  dedup_minhash_lsh rides fixed-size documents but
# holds the largest per-task Arrow/agg state of the pipeline families.
HEAVY = os.environ.get(
    "SPARK_GRAFT_MEMSTRESS_QUERIES",
    "q01_pricing_summary,q03_top_orders,q05_region_nation_revenue,"
    "q07_volume_shipping,q08_market_share,q18_large_orders,"
    "q21_waiting_suppliers,top_customers_window,segment_nation_rollup,"
    "dedup_minhash_lsh",
).split(",")


def _norm(v):
    # keep in lockstep with scripts/driver_sim.py's normalizer (the driver
    # %.10g protocol) — cross-heap checksums must stay comparable to the
    # correctness harness's notion of equality
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def child(heap: str) -> None:
    """Fresh-JVM run at one heap size; prints one JSON line."""
    from arthur_redshift_etl_spark import workload
    from arthur_redshift_etl_spark.plans.metrics import stage_totals
    from arthur_redshift_etl_spark.session import build_session

    # local[8] + 8 shuffle partitions: FEWER, FATTER partitions than the
    # bench (32) so per-task state is larger — the stress is per-task
    # memory, not parallelism.  Heap must be set before the JVM launches,
    # hence the fresh process.
    spark = build_session(
        app_name=f"memstress-{heap}",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": heap,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from arthur_redshift_etl_spark.plans.heap import ensure_heap_headroom

    # default ON: the same between-builds hygiene the loader applies.
    # SPARK_GRAFT_MEMSTRESS_GC=0 reproduces the debris failure: at 512m
    # the 3rd query dies in a broadcast build without it.
    hygiene = os.environ.get("SPARK_GRAFT_MEMSTRESS_GC", "1") == "1"
    out = {"heap": heap, "hygiene": hygiene, "gc_count": 0, "queries": {}}
    for name in HEAVY:
        if hygiene and ensure_heap_headroom(spark):
            out["gc_count"] += 1
        spec = workload.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            base = stage_totals(spark)
            rows = spec.fn(spark, TIER_DIR).collect()
            wall = time.perf_counter() - t0
            digest = hashlib.sha256(
                "\n".join(
                    sorted(",".join(_norm(x) for x in r) for r in rows)
                ).encode()
            ).hexdigest()[:16]
            after = stage_totals(spark)
            out["queries"][name] = {
                "wall": round(wall, 3),
                "rows": len(rows),
                "hash": digest,
                "mem_spill_mb": (
                    after["memory_spilled_bytes"] - base["memory_spilled_bytes"]
                )
                >> 20,
                "disk_spill_mb": (
                    after["disk_spilled_bytes"] - base["disk_spilled_bytes"]
                )
                >> 20,
            }
        except Exception as exc:  # noqa: BLE001 - failure IS the finding
            out["queries"][name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            if "ConnectionRefused" in type(exc).__name__ or "Connection refused" in str(
                exc
            ):
                # the JVM itself is gone — nothing further can run
                out["jvm_died_at"] = name
                break
        print(f"# {heap} {name}: {out['queries'][name]}", file=sys.stderr)
    print(json.dumps(out))
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 - dead JVM
        pass


def ensure_tier() -> None:
    if all(
        os.path.exists(f"{TIER_DIR}/{t}.parquet")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    ):
        print(f"# tier exists: {TIER_DIR}", file=sys.stderr)
        return
    env = dict(os.environ, SPARK_GRAFT_SCALE_COPIES=str(COPIES))
    code = (
        "import sys; sys.path.insert(0, '%s/scripts'); "
        "import bench_scale_tier as m; m.generate()" % REPO
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def main() -> int:
    ensure_tier()
    results = {}
    for heap in HEAPS:
        env = dict(os.environ, SPARK_GRAFT_MEMSTRESS_CHILD=heap)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(f"heap {heap}: CHILD DIED rc={proc.returncode}")
            print(proc.stderr[-2000:])
            return 1
        results[heap] = json.loads(lines[-1])
        print(f"# heap {heap} done", file=sys.stderr)

    ample, tight = HEAPS[0], HEAPS[-1]
    bad = 0
    print(f"\n| query | wall {ample} | wall {tight} | ratio | spill(disk) {tight} | same hash |")
    print("|---|---|---|---|---|---|")
    tight_spill = 0
    for name in HEAVY:
        # a child that died mid-sequence (jvm_died_at) has no entries for
        # the queries after the death point — report them as failures
        # instead of KeyError-ing the whole comparison table
        a = results[ample]["queries"].get(name, {"error": "jvm died earlier"})
        b = results[tight]["queries"].get(name, {"error": "jvm died earlier"})
        if "error" in a or "error" in b:
            print(f"| {name} | {a.get('error', 'ok')} | {b.get('error', 'ok')} | FAIL | | |")
            bad += 1
            continue
        same = a["hash"] == b["hash"] and a["rows"] == b["rows"]
        bad += 0 if same else 1
        tight_spill += b["disk_spill_mb"]
        print(
            f"| {name} | {a['wall']:.2f}s | {b['wall']:.2f}s | "
            f"{b['wall'] / max(a['wall'], 1e-9):.2f}x | "
            f"{b['disk_spill_mb']} MB | {'yes' if same else 'NO'} |"
        )
    print(
        f"\n# constrained-heap total disk spill: {tight_spill} MB; "
        f"failures/mismatches: {bad}"
    )
    if tight_spill == 0:
        print("# WARNING: no spill at the constrained heap — pressure not proven")
    return 1 if bad else 0


if __name__ == "__main__":
    heap = os.environ.get("SPARK_GRAFT_MEMSTRESS_CHILD")
    if heap:
        child(heap)
    else:
        raise SystemExit(main())
