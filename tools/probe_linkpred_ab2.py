"""Within-session A/B for the link_prediction rank-then-attach rewrite.

probe_linkpred_ab.py compared two SESSIONS (one per git state) and the
session-to-session drift band (±2-3 s on q272) swamped the delta — the
same lesson probe_shj_ab2 taught for the SMJ/SHJ A/B.  This probe holds
ONE session and alternates the two plan shapes, flipping the intra-round
order every round so warmth cannot systematically favour either arm:

* arm OLD — the r13 shape: wedge v-side re-joined through deg, degree
  attach as two pair-scale shuffled joins BELOW the top-k heap;
* arm NEW — the working-tree operator (rank first, then broadcast the
  ≤k rows into the degree attach; v-side reads sym directly).

Both arms run on the exact q272 (co-supplier) and q275 (fenced
user→item) fixtures.  Round 0 is discarded.
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


def old_link_prediction(edges, top_k=20, max_center_degree=None):
    """The r13 tail, verbatim shape (no report_drops — not timed)."""
    sym = (
        edges.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
        .union(edges.select(F.col("dst").alias("_s"), F.col("src").alias("_d")))
        .distinct()
        .localCheckpoint()
    )
    deg = sym.groupBy(F.col("_s").alias("_n")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    adj = sym.join(deg, sym["_s"] == deg["_n"]).select(
        F.col("_s").alias("_w"),
        F.col("_d").alias("_u"),
        F.col("_deg").alias("_degw"),
    )
    if max_center_degree is not None:
        adj = adj.filter(F.col("_degw") <= max_center_degree)
    a = adj.select("_w", F.col("_u").alias("u"), "_degw")
    b = adj.select(F.col("_w").alias("_w2"), F.col("_u").alias("v"))
    wedges = a.join(b, a["_w"] == b["_w2"]).where(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(
            (F.lit(1.0) / F.log(F.col("_degw").cast("double"))).cast(
                "decimal(38,6)"
            )
        ).cast("double").alias("_aa"),
    )
    ek = edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    cand = scored.join(ek, ["u", "v"], "left_anti")
    du = deg.select(F.col("_n").alias("u"), F.col("_deg").alias("_du"))
    dv = deg.select(F.col("_n").alias("v"), F.col("_deg").alias("_dv"))
    full = cand.join(du, "u").join(dv, "v")
    jac = F.col("cn").cast("double") / (
        F.col("_du") + F.col("_dv") - F.col("cn")
    ).cast("double")
    return (
        full.select(
            "u", "v", "cn",
            F.round(jac, 6).alias("jaccard"),
            F.round("_aa", 6).alias("adamic_adar"),
            F.col("_aa").alias("_o"),
        )
        .orderBy(F.col("_o").desc(), F.col("u"), F.col("v"))
        .limit(top_k)
        .select("u", "v", "cn", "jaccard", "adamic_adar")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry  # noqa: F401  (for _t conf parity)
    from btc_usdt_etl_pipeline_spark.operators.graph import link_prediction
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session(
        "probe-linkpred-ab2",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def edges_272():
        li = (
            entry._t(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") % 20 == 0)
            .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
            .distinct()
        )
        a = li.select(F.col("o"), F.col("s").alias("src"))
        b = li.select(F.col("o"), F.col("s").alias("dst"))
        return (
            a.join(b, "o")
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )

    def edges_275():
        e = entry._t(spark, sf_dir, "events")
        return e.select(
            F.col("user_id").alias("src"),
            (F.lit(1000000) + F.col("event_id") % 4999).alias("dst"),
        ).distinct()

    cases = {
        "q272": (edges_272, dict(top_k=20)),
        "q275": (edges_275, dict(top_k=15, max_center_degree=64)),
    }
    arms = {
        "old": old_link_prediction,
        "new": link_prediction,
    }

    n_runs = int(os.environ.get("PROBE_RUNS", "5"))
    samples: dict[str, list[float]] = {
        f"{c}/{a}": [] for c in cases for a in arms
    }
    for rnd in range(n_runs):
        order = ["old", "new"] if rnd % 2 == 0 else ["new", "old"]
        for cname, (mk_edges, kw) in cases.items():
            for arm in order:
                spark.sparkContext.setJobDescription(f"{cname}/{arm} r{rnd}")
                t0 = time.time()
                df = arms[arm](mk_edges(), **kw)
                df.write.mode("overwrite").format("noop").save()
                el = time.time() - t0
                spark.catalog.clearCache()
                if rnd > 0:
                    samples[f"{cname}/{arm}"].append(el)
                print(f"  round {rnd} {cname}/{arm}: {el:.2f}s", flush=True)
    out = {
        n: round(statistics.median(s), 3) for n, s in samples.items()
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
