"""Backfill / retry orchestration semantics (SURVEY.md §3 parity).

The reference schedules its chain with 4 Airflow DAGs (retries=1..2,
catchup backfills, XCom hand-off — ``airflow/dags/new6.py:32-147``).
The engine's data chain is one lazy job (``runner.run_etl``), so the
only orchestration semantics a user actually loses are:

- **backfill**: run the chain once per logical partition of a date
  range, each run independently retried and idempotent;
- **retry with bounded attempts** and an error policy (fail-fast vs
  continue-and-report — Airflow's per-task retries + trigger rules).

This module provides exactly those, deliberately WITHOUT a scheduler
daemon: partition-level idempotence comes from the warehouse writers'
dynamic partition overwrite (rerunning a day replaces exactly that
day), so any external scheduler — cron, Airflow, a shell loop — can
drive ``backfill`` safely.  The driver-side loop is orchestration
metadata (one entry per partition), never data.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace

from pyspark.sql import SparkSession

from btc_usdt_etl_pipeline_spark.pipeline.runner import EtlConfig, run_etl


@dataclass(frozen=True)
class RunResult:
    """Outcome of one backfill partition: Airflow's task-instance
    record reduced to what a caller can act on."""

    partition: str
    attempts: int
    ok: bool
    error: str | None
    seconds: float


def run_with_retries(
    spark: SparkSession,
    cfg: EtlConfig,
    partition: str = "",
    max_attempts: int = 3,
    backoff_seconds: float = 0.0,
) -> RunResult:
    """Run one ETL chain with bounded retries (the reference DAGs'
    ``retries=1..2``).  Safe to retry because every write in the chain
    is idempotent (dynamic partition overwrite / table overwrite); a
    partial failed attempt never double-appends."""
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    t0 = time.time()
    err: str | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            run_etl(spark, cfg)
            return RunResult(
                partition, attempt, True, None, time.time() - t0
            )
        except Exception as exc:  # noqa: BLE001 — policy layer
            err = f"{type(exc).__name__}: {exc}"
            if attempt < max_attempts and backoff_seconds > 0:
                time.sleep(backoff_seconds * attempt)
    return RunResult(
        partition, max_attempts, False, err, time.time() - t0
    )


def backfill(
    spark: SparkSession,
    cfg: EtlConfig,
    partitions: list[str],
    path_template: str | None = None,
    table_template: str | None = None,
    max_attempts: int = 3,
    on_error: str = "continue",
    backoff_seconds: float = 0.0,
) -> list[RunResult]:
    """Run the ETL chain once per logical partition (Airflow catchup).

    ``partitions`` are opaque labels (dates, months, symbol names);
    ``path_template`` maps each to its input path via ``{p}``
    substitution (default: ``cfg.input_path`` already points at the
    partition's data and the label is informational).

    **Per-partition idempotence requires per-partition targets.**  A
    multi-partition backfill where every run full-overwrites the SAME
    table would silently keep only the last partition, so the target
    must be disjoint per partition — either ``table_template``
    (``{p}``-substituted output table per partition) or a
    ``cfg.partition_by`` column layout where each run's rows land in
    its own table partitions (dynamic partition overwrite).  With
    neither set and more than one partition, this raises instead of
    destroying data.  Under that contract, rerunning ANY subset of
    ``partitions`` replaces exactly those partitions' output.

    ``on_error="continue"`` finishes the range and reports per-run
    results (Airflow's all_done trigger rule); ``"fail"`` raises on
    the first exhausted partition (all_success)."""
    if on_error not in ("continue", "fail"):
        raise ValueError("on_error must be 'continue' or 'fail'")
    if (
        len(partitions) > 1
        and table_template is None
        and not cfg.partition_by
    ):
        raise ValueError(
            "multi-partition backfill with a single full-overwrite "
            "table would keep only the LAST partition; pass "
            "table_template='{p}'-style per-partition tables or an "
            "EtlConfig.partition_by column layout"
        )
    results: list[RunResult] = []
    for p in partitions:
        run_cfg = cfg
        if path_template is not None:
            run_cfg = replace(run_cfg, input_path=path_template.format(p=p))
        if table_template is not None:
            run_cfg = replace(run_cfg, table=table_template.format(p=p))
        res = run_with_retries(
            spark, run_cfg, partition=p, max_attempts=max_attempts,
            backoff_seconds=backoff_seconds,
        )
        results.append(res)
        if not res.ok and on_error == "fail":
            raise RuntimeError(
                f"backfill partition {p!r} failed after "
                f"{res.attempts} attempts: {res.error}"
            )
    return results
