"""Within-session A/B for the bradley_terry pair-count pre-aggregation.

Arm OLD (r13 shape): ONE aggregation evaluating k(k-1) conditional
``sum(when(w == item_i AND l == item_j, 1))`` expressions per INPUT row
— 2·k(k-1) string equality tests per comparison row in the scan stage.

Arm NEW (working tree): ``groupBy(winner, loser).count()`` first (hash
agg keyed on the two strings, map-side combined), then the SAME k(k-1)
conditional sums run over the tiny pair-count table (≤ distinct pairs
rows).  Bit-identical by construction: integer counts either way, and
the empty-input → NULL-sums edge case is preserved because the second
aggregate sees zero rows exactly when the first saw zero rows.

Methodology: probe_shj_ab2's — one session, intra-round order flipped
per round, round 0 discarded.  Runs the exact q242 fixture.
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


def old_bt(df, winner_col, loser_col, items, iterations=20):
    """r13 tail: single k(k-1)-conditional-sum aggregation."""
    from btc_usdt_etl_pipeline_spark.operators.stats import bt_schedule

    k = len(items)
    w, l = F.col(winner_col), F.col(loser_col)
    aggs = []
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            aggs.append(
                F.sum(
                    F.when((w == items[i]) & (l == items[j]), 1).otherwise(0)
                )
                .cast("double")
                .alias(f"w_{i}_{j}")
            )
    row = df.agg(*aggs)
    base, rounds = bt_schedule(items, iterations)
    row = row.select("*", *[F.expr(e).alias(c) for c, e in base])
    for step in rounds:
        row = row.select("*", *[F.expr(e).alias(c) for c, e in step])
    cells = []
    for i, name in enumerate(items):
        cells.extend(
            [
                f"'{name}'",
                f"round(q{iterations}_{i}, 6)",
                f"CAST(bt_w_{i} AS BIGINT)",
                f"CAST(bt_l_{i} AS BIGINT)",
            ]
        )
    return row.select(
        F.expr(
            f"stack({k}, {', '.join(cells)}) AS "
            "(item, strength, wins, losses)"
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.operators.stats import bradley_terry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session(
        "probe-bt-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    items = entry._BT_ITEMS

    def comp():
        e = entry._t(spark, sf_dir, "events").where(
            F.col("event_type").isNotNull()
        )
        tarr = F.array(*[F.lit(t) for t in items])
        b = F.element_at(tarr, (F.col("event_id") % 5).cast("int") + 1)
        ra = F.array_position(tarr, F.col("event_type")) - 1
        rb = F.col("event_id") % 5
        win_a = (F.col("event_id") % 10) < (F.lit(5) + ra - rb)
        return (
            e.select(
                F.col("event_type").alias("a"), b.alias("b"),
                win_a.alias("win_a"),
            )
            .where(F.col("a") != F.col("b"))
            .select(
                F.when(F.col("win_a"), F.col("a"))
                .otherwise(F.col("b"))
                .alias("winner"),
                F.when(F.col("win_a"), F.col("b"))
                .otherwise(F.col("a"))
                .alias("loser"),
            )
        )

    arms = {
        "old": lambda df: old_bt(df, "winner", "loser", items),
        "new": lambda df: df.transform(
            bradley_terry("winner", "loser", items)
        ),
    }
    n_runs = int(os.environ.get("PROBE_RUNS", "5"))
    samples: dict[str, list[float]] = {a: [] for a in arms}
    for rnd in range(n_runs):
        order = ["old", "new"] if rnd % 2 == 0 else ["new", "old"]
        for arm in order:
            spark.sparkContext.setJobDescription(f"bt/{arm} r{rnd}")
            t0 = time.time()
            arms[arm](comp()).write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            spark.catalog.clearCache()
            if rnd > 0:
                samples[arm].append(el)
            print(f"  round {rnd} bt/{arm}: {el:.2f}s", flush=True)
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
