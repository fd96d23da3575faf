"""Targeted probe: time a named subset of headline queries (noop sink,
interleaved rounds, median) — the bench methodology on a handful of
queries so a single operator change can be A/B'd against the same
script run on a different git state.

Usage: python tools/probe_linkpred_ab.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS, PROBE_RUNS (default 5, round 0 discarded).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    names = sys.argv[1:] or [
        "q272_link_prediction",
        "q275_link_prediction_fenced",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session(
        "probe-linkpred", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n_runs = int(os.environ.get("PROBE_RUNS", "5"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(n_runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            spark.catalog.clearCache()
            if rnd > 0:  # round 0 = warm-up, discarded
                samples[name].append(el)
            print(f"  round {rnd} {name}: {el:.2f}s", flush=True)
    out = {
        n: {
            "median": round(statistics.median(s), 3),
            "min": round(min(s), 3),
            "max": round(max(s), 3),
        }
        for n, s in samples.items()
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
