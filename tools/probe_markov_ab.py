"""Within-session A/B for the markov_stationary driver-replay rewrite
(the bradley_terry twin — see probe_bt_ab.py for the methodology:
one session, intra-round order flipped per round, round 0 discarded).

Arm OLD: r13 shape — k² conditional sums per input row + the
2·iterations-deep markov_schedule SELECT chain on the data path.
Arm NEW: working tree — groupBy(prev, next) pre-agg + driver-Python
power-iteration replay.  Runs the exact q257 fixture.
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

from pyspark.sql import functions as F  # noqa: E402


def old_markov(df, prev_col, next_col, states, iterations=15):
    from btc_usdt_etl_pipeline_spark.operators.stats import markov_schedule

    k = len(states)
    p, n = F.col(prev_col), F.col(next_col)
    aggs = []
    for i in range(k):
        for j in range(k):
            aggs.append(
                F.sum(
                    F.when((p == states[i]) & (n == states[j]), 1)
                    .otherwise(0)
                )
                .cast("double")
                .alias(f"c_{i}_{j}")
            )
    row = df.agg(*aggs)
    base, rounds = markov_schedule(states, iterations)
    row = row.select("*", *[F.expr(e).alias(c) for c, e in base])
    for step in rounds:
        row = row.select("*", *[F.expr(e).alias(c) for c, e in step])
    cells = []
    for i, name in enumerate(states):
        col_in = " + ".join(f"c_{j}_{i}" for j in range(k))
        cells.extend(
            [
                f"'{name}'",
                f"CAST(mk_r_{i} AS BIGINT)",
                f"CAST(({col_in}) AS BIGINT)",
                f"round(v{iterations}_{i}, 6)",
            ]
        )
    return row.select(
        F.expr(
            f"stack({k}, {', '.join(cells)}) AS "
            "(state, n_out, n_in, stationary)"
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.operators.stats import (
        markov_stationary,
    )
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session(
        "probe-markov-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    states = entry._MK_STATES
    iters = entry._MK_ITERS

    def trans():
        from btc_usdt_etl_pipeline_spark.operators.windows import keyed_lags

        e = entry._t(spark, sf_dir, "events").where(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        return (
            e.select("user_id", "ts", "event_id", "event_type")
            .transform(
                keyed_lags(
                    [("event_type", 1, "prv")],
                    order_by=["ts", "event_id"],
                    partition_by=["user_id"],
                )
            )
            .where(F.col("prv").isNotNull())
            .select("prv", F.col("event_type").alias("nxt"))
        )

    arms = {
        "old": lambda df: old_markov(df, "prv", "nxt", states, iters),
        "new": lambda df: df.transform(
            markov_stationary("prv", "nxt", states, iterations=iters)
        ),
    }
    n_runs = int(os.environ.get("PROBE_RUNS", "5"))
    samples: dict[str, list[float]] = {a: [] for a in arms}
    for rnd in range(n_runs):
        order = ["old", "new"] if rnd % 2 == 0 else ["new", "old"]
        for arm in order:
            spark.sparkContext.setJobDescription(f"markov/{arm} r{rnd}")
            t0 = time.time()
            arms[arm](trans()).write.mode("overwrite").format(
                "noop"
            ).save()
            el = time.time() - t0
            spark.catalog.clearCache()
            if rnd > 0:
                samples[arm].append(el)
            print(f"  round {rnd} markov/{arm}: {el:.2f}s", flush=True)
    print(
        json.dumps(
            {
                a: {
                    "median": round(statistics.median(s), 3),
                    "all": [round(x, 2) for x in s],
                }
                for a, s in samples.items()
            },
            indent=1,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
