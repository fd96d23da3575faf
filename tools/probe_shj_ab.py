"""A/B: sort-merge vs shuffled-hash join preference on the SMJ-heavy
headline queries (guide §3.1), interleaved rounds, median.

    python tools/probe_shj_ab.py [sf_dir] [q1,q2,...]

Config A (baseline): repo defaults (preferSortMergeJoin=true).
Config B: preferSortMergeJoin=false +
          spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
Both runtime-settable SQL confs, so the A/B runs inside ONE session
with interleaved rounds (the bench methodology) — no JVM restart noise.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QS = [
    "q272_link_prediction",
    "q119_dedup_clusters_star",
    "q178_grid_clusters",
    "q66_corpus_pipeline",
    "q125_ngram_jaccard_capped",
    "q132_semdedup",
    "q83_star_join",
    "q24_asof_join",
    "q60_range_join",
    "q165_leakage_safe_split",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QS

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("shj-ab", extra_conf={
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
    for rnd in range(4):
        for name in names:
            for tag, b in (("smj", False), ("shj", True)):
                set_mode(b)
                spark.sparkContext.setJobDescription(f"{name}[{tag}] r{rnd}")
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.setdefault((name, tag), []).append(time.time() - t0)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(None)
    for name in names:
        a = statistics.median(samples[(name, "smj")])
        b = statistics.median(samples[(name, "shj")])
        print(f"{name}: smj={a:.2f}s shj={b:.2f}s ratio={b/a:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
