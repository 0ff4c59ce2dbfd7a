"""Summarize the calm-gated A/B pairs in bench_ab14/ into verdict tables.

Reads every gflag_*/gcode_* record (plus the v2 harness's one clean pair
that a falsy-0.0 bug discarded — re-admitted explicitly by tag), pairs legs
by kept-index, and prints per-variant cold/warm totals plus per-query
medians and pairwise win counts.
"""

import glob
import json
import os
import statistics
import sys

OUT = "/root/repo/bench_ab14"

# v2 harness discarded this genuinely clean pair through the `or 9` falsy-
# zero bug (see ab_calm_window_r14.contaminated note) — re-admit it.
READMIT = {"gflag_off_k1a1", "gflag_on_k1a1"}


def load(prefix: str):
    recs = []
    for path in sorted(glob.glob(os.path.join(OUT, f"{prefix}*.json"))):
        if path.endswith(".full.json"):
            continue
        with open(path) as fh:
            r = json.load(fh)
        tag = r["tag"]
        host = (r.get("bench") or {}).get("host") or {}
        steal = host.get("steal_cores")
        kept = not r.get("discarded") or (
            tag in READMIT and steal is not None and steal < 0.30
        )
        if r.get("rc") != 0 or not kept:
            continue
        recs.append(r)
    return recs


def summarize(prefix: str, a_key: str, b_key: str) -> None:
    recs = load(prefix)
    sides = {a_key: [], b_key: []}
    for r in recs:
        for k in sides:
            if f"_{k}_" in r["tag"] or r["tag"].startswith(f"{prefix}{k}"):
                sides[k].append(r)
    print(f"== {prefix}: kept {len(sides[a_key])} {a_key} / "
          f"{len(sides[b_key])} {b_key} runs ==")
    if not sides[a_key] or not sides[b_key]:
        return
    for metric in ("value", "value_warm"):
        med = {
            k: statistics.median(r["bench"][metric] for r in v)
            for k, v in sides.items()
        }
        print(f"  {metric}: {a_key} {med[a_key]:.2f}s vs {b_key} "
              f"{med[b_key]:.2f}s  ({b_key}/{a_key} = "
              f"{med[b_key] / med[a_key]:.3f})")
    # intersect across every run: different code revisions bench different
    # DEFAULT_QUERIES supersets (bloom joined in r13, pq in r14)
    names = set(sides[a_key][0]["bench"]["queries_warm"])
    for v in sides.values():
        for r in v:
            names &= set(r["bench"]["queries_warm"])
    names = sorted(names)
    wins = {a_key: 0, b_key: 0}
    rows = []
    for q in names:
        m = {
            k: statistics.median(r["bench"]["queries_warm"][q] for r in v)
            for k, v in sides.items()
        }
        w = a_key if m[a_key] <= m[b_key] else b_key
        wins[w] += 1
        rows.append((q, m[a_key], m[b_key], m[b_key] / m[a_key]))
    print(f"  per-query warm-median wins: {wins}")
    for q, a, b, ratio in sorted(rows, key=lambda t: t[3]):
        print(f"    {q}: {a_key} {a:.3f} vs {b_key} {b:.3f} ({ratio:.2f})")


if __name__ == "__main__":
    summarize("gflag_", "off", "on")
    summarize("gcode_", "r13", "r12")
    sys.exit(0)
