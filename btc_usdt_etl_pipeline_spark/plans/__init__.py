"""Physical-plan introspection helpers.

The engine's performance contracts (SURVEY.md §4, SCALE.md §1) are plan
properties — filters reaching the scan, pruned read schemas, broadcast
dim joins, no cartesian products, whole-stage codegen.  These helpers
make those properties assertable from tests and audit tools instead of
eyeballed from ``explain`` output.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted",
                execute: bool = False) -> str:
    """The physical plan as text.  ``execute=True`` runs the DataFrame
    first so AQE's FINAL plan (with codegen ids) is shown — the
    pre-execution adaptive plan hides them."""
    if execute:
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters`` entry across the plan's scans."""
    out: list[str] = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ``ReadSchema`` (pruning check)."""
    out: list[list[str]] = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            body = line.split("struct<", 1)[-1].rstrip(">")
            out.append(
                [f.split(":")[0] for f in body.split(",") if ":" in f]
            )
    return out


def join_kinds(df: DataFrame) -> list[str]:
    """Join operator names appearing in the plan, in plan order."""
    kinds = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    plan = plan_string(df)
    found: list[str] = []
    for line in plan.splitlines():
        for k in kinds:
            if k in line:
                found.append(k)
                break
    return found


def has_partition_pruning(df: DataFrame) -> bool:
    """True when the scan carries a non-empty PartitionFilters entry."""
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            body = line.split(":", 1)[1].strip()
            if body not in ("[]", ""):
                return True
    return False


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """True when the (executed, final) plan carries codegen stages."""
    return "codegen id" in plan_string(df, execute=True)
