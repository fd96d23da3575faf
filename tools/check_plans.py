"""Physical-plan audit: assert the plans we *want*, not just ones that run.

Guards the scale-critical plan properties per SURVEY.md §4 / the 100 TB
design notes: predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for dim tables, no accidental cartesian
products, whole-stage codegen on the hot paths.

    python tools/check_plans.py          # audits the key queries at sf0.01
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE only annotates codegen ids on the FINAL plan, which exists
        # after an action on THIS DataFrame (count() would build its own
        # separate plan).
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    failures: list[str] = []

    def check(name: str, cond: bool, why: str) -> None:
        tag = "ok  " if cond else "FAIL"
        print(f"{tag} {name}: {why}")
        if not cond:
            failures.append(f"{name}: {why}")

    # q01: flagship — filter pushed to scan, columns pruned, codegen on
    p = plan_of(qs["q01_pricing_summary"](spark, SF_DIR), execute=True)
    check("q01", "LessThanOrEqual(l_shipdate" in p, "shipdate filter pushed to scan")
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    check("q01", rs and rs[0].count(":") <= 8, "column pruning (<=7 cols read)")
    check("q01", "codegen id" in p, "whole-stage codegen active")

    # q02: selective filter — every predicate pushed
    p = plan_of(qs["q02_revenue_filter"](spark, SF_DIR))
    for f in ("l_shipdate", "l_discount", "l_quantity"):
        check("q02", f"IsNotNull({f})" in p, f"{f} pushdown")
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    check("q02", rs and rs[0].count(":") <= 5, "reads only the 4 needed columns")

    # Dim-table joins must broadcast, never sort-merge
    for name in ("q03_customer_revenue", "q04_region_stats",
                 "q05_semi_join", "q06_anti_join"):
        p = plan_of(qs[name](spark, SF_DIR))
        check(name, "BroadcastHashJoin" in p, "dim join broadcasts")
        check(name, "SortMergeJoin" not in p, "no sort-merge on dim join")

    # as-of join: range logic must not degenerate to a cartesian product
    p = plan_of(qs["q24_asof_join"](spark, SF_DIR))
    check("q24", "CartesianProduct" not in p, "no cartesian product")

    # Every query: no accidental cartesian products (BroadcastNestedLoop
    # is allowed only where a broadcast cross join is the algorithm:
    # brute-force similarity and IVF centroid assignment).
    allow_bnlj = {"q31_simsearch_bruteforce", "q40_simsearch_ivf",
                  "q47_simsearch_lsh"}
    for name, fn in sorted(qs.items()):
        if name.startswith("q36") or name.startswith("q46"):
            continue  # streaming — explain differs
        p = plan_of(fn(spark, SF_DIR))
        check(name, "CartesianProduct" not in p, "no CartesianProduct")
        if name not in allow_bnlj:
            check(
                name,
                "BroadcastNestedLoopJoin" not in p,
                "no nested-loop join",
            )

    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
