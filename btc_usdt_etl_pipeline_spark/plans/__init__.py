"""Plan inspection helpers (scale hygiene: verify pushdown/broadcast/codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_flags(df: DataFrame) -> dict[str, bool]:
    """Quick structural checks used by tests and by the bench harness:
    did the plan broadcast, push filters into the scan, and stay in
    whole-stage codegen?"""
    plan = formatted_plan(df)
    return {
        "has_broadcast": "BroadcastHashJoin" in plan or "BroadcastExchange" in plan,
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "has_codegen": "WholeStageCodegen" in plan,
        "has_single_partition_exchange": "Exchange SinglePartition" in plan,
    }
