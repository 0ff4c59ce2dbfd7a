"""Round-14 calm-window adjudication (VERDICT r13 item 2), calm-GATED.

First attempt (records flag_off1..flag_off2 in bench_ab14/) ran on a fixed
schedule and collided with a neighbor-steal wave (host_steal 0.36 -> 1.44
cores, warm totals 35.7 -> 81.1 s on identical code) — useless for a
10-20% effect.  Lesson applied here: steal on this box only materializes
UNDER LOAD (idle /proc/stat steal stays ~0 while a loaded probe sees >1
core), so the gate runs a 6-second all-core spin and measures steal ticks
during it.  Each A/B *pair* runs back-to-back only inside a verified-calm
window, and a pair is kept only if both runs' own host meters stayed calm
(host_steal < DISCARD_STEAL) — otherwise it is retried later.  Pairs are
spread over hours, which also de-correlates any residual noise.

Experiments (same as the first attempt):
  1. AQE coalescePartitions.parallelismFirst false (r13 default) vs true,
     PAIRS_FLAG kept pairs, lead alternating.
  2. r13 code (/root/repo) vs r12 code (/root/r12wt, f037e16), PAIRS_CODE
     kept pairs, lead alternating.

Results: bench_ab14/<tag>.json (+ .full.json / .stdout / .stderr) and a
running bench_ab14/summary.json.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import time

REPO = "/root/repo"
# code-pair experiment: r13 FINAL (a5860c2) vs r12 final — adjudicates the
# 12 queries PERF_r13 flagged, so it must compare those two revisions, not
# the round-14 working tree (which the flag experiment measures)
R13 = "/root/r13wt"
R12 = "/root/r12wt"
OUT = os.path.join(REPO, "bench_ab14")
FLAG = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

PAIRS_FLAG = int(os.environ.get("AB_PAIRS_FLAG", "5"))
PAIRS_CODE = int(os.environ.get("AB_PAIRS_CODE", "3"))
CALM_STEAL = 0.10    # loaded-probe gate to START a pair
DISCARD_STEAL = 0.30  # per-run host-meter bound to KEEP a run
DEADLINE_S = int(os.environ.get("AB_DEADLINE_S", str(4 * 3600)))
PROBE_S = 6.0


def _spin(stop_t: float) -> None:
    x = 1.0
    while time.time() < stop_t:
        for _ in range(100_000):
            x = x * 1.0000001
    _ = x


def loaded_steal_probe(seconds: float = PROBE_S) -> float:
    """Steal cores measured WHILE saturating every CPU — the only probe
    that sees this hypervisor's contention (idle steal reads ~0)."""
    def ticks() -> int:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    n = multiprocessing.cpu_count()
    stop_t = time.time() + seconds
    procs = [
        multiprocessing.Process(target=_spin, args=(stop_t,)) for _ in range(n)
    ]
    s0, t0 = ticks(), time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    elapsed = time.time() - t0
    return round((ticks() - s0) / os.sysconf("SC_CLK_TCK") / elapsed, 3)


def run_bench(tag: str, repo: str, conf: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_CPUS="32",
        SPARK_GRAFT_BENCH_RECHECK="0",
        SPARK_GRAFT_CONF=conf,
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, cwd=repo,
    )
    wall = round(time.time() - t0, 1)
    with open(os.path.join(OUT, f"{tag}.stdout"), "w") as fh:
        fh.write(proc.stdout)
    with open(os.path.join(OUT, f"{tag}.stderr"), "w") as fh:
        fh.write(proc.stderr[-20000:])
    full_path = os.path.join(repo, "bench_full.json")
    record: dict = {"tag": tag, "rc": proc.returncode, "wall": wall,
                    "conf": conf, "repo": repo}
    if os.path.exists(full_path):
        with open(full_path) as fh:
            record["bench"] = json.load(fh)
        shutil.copy(full_path, os.path.join(OUT, f"{tag}.full.json"))
    with open(os.path.join(OUT, f"{tag}.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    b = record.get("bench", {})
    record["host_steal"] = (b.get("host") or {}).get("steal_cores")
    print(
        f"[{tag}] rc={proc.returncode} wall={wall}s cold={b.get('value')} "
        f"warm={b.get('value_warm')} host_steal={record['host_steal']}",
        flush=True,
    )
    return record


def wait_for_calm(deadline: float) -> bool:
    while time.time() < deadline:
        s = loaded_steal_probe()
        print(f"# loaded-steal probe: {s}", flush=True)
        if s < CALM_STEAL:
            return True
        time.sleep(90)
    return False


def run_pair(tag: str, legs: list[tuple[str, str, str]], deadline: float) -> bool:
    """legs: [(subtag, repo, conf), ...].  Returns True if the pair was
    kept (both legs calm), False if discarded or deadline hit."""
    if not wait_for_calm(deadline):
        print(f"# {tag}: deadline before calm window", flush=True)
        return False
    records = [run_bench(subtag, repo, conf) for subtag, repo, conf in legs]

    def contaminated(r: dict) -> bool:
        host = (r.get("bench") or {}).get("host") or {}
        # steal = hypervisor neighbor; other_cores = in-VM competitor
        # (e.g. a stray pytest) — either invalidates the pair.  NOTE:
        # `or 9` would treat a perfect 0.0 as missing (first run of the
        # v2 harness discarded a 0.0/0.0 pair exactly that way) — only a
        # truly absent meter is treated as contaminated.
        steal = host.get("steal_cores")
        other = host.get("other_cores")
        return (
            steal is None
            or steal >= DISCARD_STEAL
            or (other is not None and other >= 1.0)
        )

    bad = [r["tag"] for r in records if r["rc"] != 0 or contaminated(r)]
    if bad:
        print(f"# {tag}: DISCARDED (contaminated/failed: {bad})", flush=True)
        for r in records:
            r["discarded"] = True
            with open(os.path.join(OUT, f"{r['tag']}.json"), "w") as fh:
                json.dump(r, fh, indent=1)
        return False
    return True


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    deadline = time.time() + DEADLINE_S
    kept_flag = kept_code = attempt = 0
    while kept_flag < PAIRS_FLAG and time.time() < deadline:
        attempt += 1
        lead_on = kept_flag % 2 == 1
        order = ["on", "off"] if lead_on else ["off", "on"]
        legs = [
            (f"gflag_{v}_k{kept_flag + 1}a{attempt}", REPO,
             f"{FLAG}={'true' if v == 'on' else 'false'}")
            for v in order
        ]
        if run_pair(f"flag pair {kept_flag + 1}", legs, deadline):
            kept_flag += 1
    attempt = 0
    while kept_code < PAIRS_CODE and time.time() < deadline:
        attempt += 1
        lead_12 = kept_code % 2 == 1
        order = ["r12", "r13"] if lead_12 else ["r13", "r12"]
        legs = [
            (f"gcode_{v}_k{kept_code + 1}a{attempt}",
             R13 if v == "r13" else R12, "")
            for v in order
        ]
        if run_pair(f"code pair {kept_code + 1}", legs, deadline):
            kept_code += 1
    print(f"done: kept_flag={kept_flag} kept_code={kept_code}", flush=True)


if __name__ == "__main__":
    main()
