"""Within-session A/B for the r14 SRP-LSH staged-dot-columns rewrite
(probe_shj_ab2 methodology: one session, intra-round order flipped per
round, round 0 discarded).

Arm OLD reconstructs the r13 expression shape verbatim — base bucket +
per-plane dot folds INLINED into every probe-mask struct that
references them.  Arm NEW is the working-tree ``lsh_top_k``, which
stages each (table, plane) dot product as one projected column that
bucket packing and probe scoring both reference.  Fixtures are the
exact q142 (multi-probe, tables=4/planes=6/probes=6) and q47
(tables=8, single-probe) declared queries, portable (md5) mode as
benched.

(A second r14 experiment — precomputing the hyperplane components as
literal arrays via a metadata job — measured a WASH on the corpus side
and a small overall regression: the per-row cost is the interpreted
higher-order-function fold, not the hash derivation.  Reverted; not an
arm here.)
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
from pyspark.sql import Window  # noqa: E402


def old_lsh_top_k(
    corpus, queries, k, planes, tables, portable, round_dp, probes
):
    """The r13 lsh_top_k tail: inlined folds, no staged dot columns."""
    from btc_usdt_etl_pipeline_spark.operators.similarity import (
        _srp_bucket,
        _srp_dot,
        cosine_similarity,
    )

    def table_keys(vec, table, n_probes):
        base = _srp_bucket(vec, table, planes, portable)
        if n_probes <= 0:
            return F.array(base)
        masks = [((p,), 1 << p) for p in range(planes)] + [
            ((p, r), (1 << p) | (1 << r))
            for p in range(planes)
            for r in range(p + 1, planes)
        ]
        dots = {
            p: F.abs(_srp_dot(vec, table, p, portable))
            for p in range(planes)
        }

        def score(ps):
            s = dots[ps[0]]
            for p in ps[1:]:
                s = s + dots[p]
            return s

        chosen = F.slice(
            F.array_sort(
                F.array(
                    *[
                        F.struct(score(ps).alias("a"), F.lit(m).alias("m"))
                        for ps, m in masks
                    ]
                )
            ),
            1,
            min(n_probes, len(masks)),
        )
        return F.concat(
            F.array(base),
            F.transform(chosen, lambda s: base.bitwiseXOR(s["m"])),
        )

    def tag(t):
        return lambda b: F.struct(F.lit(t).alias("t"), b.alias("b"))

    def with_buckets(df, idc, n_probes):
        buckets = F.flatten(
            F.array(
                *[
                    F.transform(
                        table_keys(F.col("embedding"), t, n_probes), tag(t)
                    )
                    for t in range(tables)
                ]
            )
        )
        return df.select(
            F.col(idc), F.col("embedding"), F.explode(buckets).alias("_bk")
        )

    c = with_buckets(corpus, "vec_id", 0)
    q = with_buckets(queries, "query_id", probes).select(
        F.col("query_id").alias("_qid"),
        F.col("embedding").alias("_qvec"),
        F.col("_bk").alias("_qbk"),
    )
    cand = (
        c.join(q, (c["_bk"] == q["_qbk"]))
        .select(
            F.col("_qid").alias("query_id"),
            F.col("vec_id"),
            F.col("embedding"),
            F.col("_qvec"),
        )
        .dropDuplicates(["query_id", "vec_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    cos = F.round(
        cosine_similarity(F.col("embedding"), F.col("_qvec")), round_dp
    )
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.operators.similarity import lsh_top_k
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session(
        "probe-lsh-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def fixture():
        e = entry._t(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return e, q

    cases = {
        "q142_multiprobe": dict(
            k=10, planes=6, tables=4, portable=True, round_dp=4, probes=6
        ),
        "q47_lsh": dict(
            k=10, planes=6, tables=8, portable=True, round_dp=4, probes=0
        ),
    }

    def run_old(kw):
        e, q = fixture()
        return old_lsh_top_k(e, q, **kw)

    def run_new(kw):
        e, q = fixture()
        return lsh_top_k(e, q, dim=64, **kw)

    arms = {"old_inlined": run_old, "new_staged": run_new}
    n_runs = int(os.environ.get("PROBE_RUNS", "4"))
    samples: dict[str, list[float]] = {
        f"{c}/{a}": [] for c in cases for a in arms
    }
    for rnd in range(n_runs):
        order = (
            ["old_inlined", "new_staged"]
            if rnd % 2 == 0
            else ["new_staged", "old_inlined"]
        )
        for cname, kw in cases.items():
            for arm in order:
                spark.sparkContext.setJobDescription(f"{cname}/{arm} r{rnd}")
                t0 = time.time()
                arms[arm](kw).write.mode("overwrite").format("noop").save()
                el = time.time() - t0
                spark.catalog.clearCache()
                if rnd > 0:
                    samples[f"{cname}/{arm}"].append(el)
                print(
                    f"  round {rnd} {cname}/{arm}: {el:.2f}s", flush=True
                )
    print(
        json.dumps(
            {
                n: {
                    "median": round(statistics.median(s), 3),
                    "all": [round(x, 2) for x in s],
                }
                for n, s in samples.items()
            },
            indent=1,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
