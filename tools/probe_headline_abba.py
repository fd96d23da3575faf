"""Settle the r14 0.82x headline (VERDICT r14 ask #2): like-for-like
full-roster bench of the r13 code tree vs the current tree, same idle
session window, ABBA order so slow ambient drift cancels to first order.

Each arm is one bench.py subprocess (its own JVM — the trees cannot
share a process: both define __spark_entry__).  Arms alternate
A(r13) B(now) B(now) A(r13); each invocation runs the full headline
roster with SPARK_GRAFT_BENCH_RUNS internal interleaved rounds
(default 2 here — the TOTAL over 231 queries is the statistic, and it
averages per-query noise by construction).  Per-invocation totals and
the per-arm means are printed and written to /tmp/abba_out.json.

Only the 231 queries common to BOTH rosters are compared (the r13
tree's bench_out.json and the current one are intersected), so a
roster difference can never masquerade as a speed difference.

Usage: python tools/probe_headline_abba.py [r13_tree_path]
Env:   ABBA_RUNS (internal rounds per invocation, default 2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

R13 = sys.argv[1] if len(sys.argv) > 1 else "/root/r13tree"
NOW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.environ.get("ABBA_RUNS", "2")


def run_arm(tree: str, tag: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_RUNS"] = RUNS
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = time.time() - t0
    if p.returncode != 0:
        print(f"[{tag}] FAILED rc={p.returncode}\n{p.stderr[-2000:]}")
        raise SystemExit(1)
    out = json.load(open(os.path.join(tree, "bench_out.json")))
    print(
        f"[{tag}] total={out['value']} wall={wall:.0f}s "
        f"n={len(out['queries'])}",
        flush=True,
    )
    return out


def main() -> None:
    arms = [("A", R13), ("B", NOW), ("B", NOW), ("A", R13)]
    results = []
    for i, (tag, tree) in enumerate(arms):
        results.append((tag, run_arm(tree, f"{i}:{tag}")))

    # Compare on the common roster only.
    common = set(results[0][1]["queries"])
    for _, r in results[1:]:
        common &= set(r["queries"])
    sums = {"A": [], "B": []}
    per_q = {"A": {}, "B": {}}
    for tag, r in results:
        sums[tag].append(sum(r["queries"][q] for q in common))
        for q in common:
            per_q[tag].setdefault(q, []).append(r["queries"][q])
    mean = {t: sum(v) / len(v) for t, v in sums.items()}
    ratio = mean["B"] / mean["A"]
    # per-query mean ratio distribution
    import statistics

    ratios = sorted(
        (statistics.mean(per_q["B"][q]) / statistics.mean(per_q["A"][q]), q)
        for q in common
        if statistics.mean(per_q["A"][q]) > 0
    )
    med = ratios[len(ratios) // 2]
    summary = {
        "common_n": len(common),
        "totals_A_r13": [round(x, 1) for x in sums["A"]],
        "totals_B_now": [round(x, 1) for x in sums["B"]],
        "mean_A": round(mean["A"], 1),
        "mean_B": round(mean["B"], 1),
        "ratio_B_over_A": round(ratio, 3),
        "per_query_ratio_median": round(med[0], 3),
        "per_query_ratio_p25": round(ratios[len(ratios) // 4][0], 3),
        "per_query_ratio_p75": round(ratios[3 * len(ratios) // 4][0], 3),
        "worst10_B_vs_A": [
            (q, round(r, 2)) for r, q in ratios[-10:]
        ],
        "best10_B_vs_A": [
            (q, round(r, 2)) for r, q in ratios[:10]
        ],
    }
    print(json.dumps(summary, indent=1), flush=True)
    with open("/tmp/abba_out.json", "w") as f:
        json.dump(
            {"summary": summary, "arms": [(t, r) for t, r in results]}, f
        )


if __name__ == "__main__":
    main()
