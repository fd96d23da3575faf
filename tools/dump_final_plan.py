"""Dump the FINAL adaptive plan (post-execution, ``isFinalPlan=true``)
for named queries to ``plans/r14/<query>_<tag>.txt``.

    python tools/dump_final_plan.py <tag> q66_corpus_pipeline ... [--sf DIR]

``explain`` before execution only shows the initial plan
(``AdaptiveSparkPlan isFinalPlan=false``): AQE rewrites — partition
coalescing, skew splits, and the runtime SMJ→SHJ conversion under
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`` — appear
only in the executed plan (guide §7.2).  This tool executes the query's
own ``QueryExecution`` via ``collect()`` (driver-safe at the audit SFs:
every audited query aggregates far below ``driver.maxResultSize``) and
prints the same instance's ``executedPlan``, which AQE has by then
replanned in place.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND_DIR = "r14"


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("final-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ROUND_DIR,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"final-plan {name}")
        n = len(df.collect())
        spark.sparkContext.setJobDescription(None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} (rows={n})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
