"""Order-bias-hardened re-run of the SMJ-vs-SHJ A/B (guide §1: measure
correctly).  The first probe ran ``smj`` before ``shj`` within every
round, so within-pair cache/JIT warmth could masquerade as an SHJ win;
this one ALTERNATES the within-round order and discards round 0
(warm-up), reporting per-round samples and medians of rounds 1..N-1.

    python tools/probe_shj_ab2.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QS = [
    "q132_semdedup",
    "q66_corpus_pipeline",
    "q178_grid_clusters",
    "q60_range_join",
    "q165_leakage_safe_split",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QS

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("shj-ab2", extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def set_mode(b: bool) -> None:
        spark.conf.set("spark.sql.join.preferSortMergeJoin", str(not b).lower())
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "67108864" if b else "0",
        )

    samples: dict[tuple[str, str], list[float]] = {}
    rounds = 5
    for rnd in range(rounds):
        for name in names:
            pair = [("smj", False), ("shj", True)]
            if rnd % 2 == 1:
                pair.reverse()
            for tag, b in pair:
                set_mode(b)
                spark.sparkContext.setJobDescription(f"{name}[{tag}] r{rnd}")
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.time() - t0
                if rnd > 0:
                    samples.setdefault((name, tag), []).append(dt)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(None)
    for name in names:
        a = samples[(name, "smj")]
        b = samples[(name, "shj")]
        am, bm = statistics.median(a), statistics.median(b)
        print(
            f"{name}: smj={am:.2f}s {['%.2f' % x for x in a]} "
            f"shj={bm:.2f}s {['%.2f' % x for x in b]} ratio={bm/am:.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
