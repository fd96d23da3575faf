"""Declarative data-quality expectations (Deequ / Great-Expectations
shape) — the verification component every production 100 TB pipeline
bolts onto its ingest edge.

An :class:`Expectation` is (name, aggregate metric, pass predicate over
the metric).  :func:`expectations` evaluates ALL metrics in ONE
aggregation pass over the table (a single job regardless of how many
constraints are registered — metrics are just extra aggregate columns)
and explodes the 1-row result into a per-constraint report
``(constraint, metric, passed)``.  No UDFs, no second scan, no driver
logic; ratios are exact integer-count divisions so a SQL oracle
reproduces them bit-for-bit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Expectation(NamedTuple):
    name: str
    metric: Column
    passed: "Callable[[Column], Column]"


def _ratio(num: Column) -> Column:
    # ANSI mode turns x/0 into an error, and an EMPTY table is a normal
    # input (pruned partition, dry landing dir): ratios are NULL there,
    # and the pass predicate then yields NULL too — the report row still
    # materializes instead of crashing the job.
    n = F.count(F.lit(1))
    return F.when(n > 0, num / n.cast("double"))


def completeness(col: str, name: str | None = None) -> Expectation:
    """Fraction of rows with ``col`` non-null; passes at 1.0."""
    m = _ratio(F.count(F.col(col)))
    return Expectation(
        name or f"completeness({col})", m, lambda x: x >= F.lit(1.0)
    )


def uniqueness(col: str, name: str | None = None) -> Expectation:
    """Distinct ratio of ``col``; passes at 1.0 (a primary-key check)."""
    m = _ratio(F.countDistinct(F.col(col)))
    return Expectation(
        name or f"uniqueness({col})", m, lambda x: x >= F.lit(1.0)
    )


def violation_ratio(
    pred: Column, name: str, max_ratio: float = 0.0
) -> Expectation:
    """Fraction of rows violating a row predicate; passes when the
    ratio is ≤ ``max_ratio``."""
    m = _ratio(F.sum(F.when(pred, 1).otherwise(0)))
    return Expectation(name, m, lambda x: x <= F.lit(float(max_ratio)))


def distinct_count_at_most(
    col: str, limit: int, name: str | None = None
) -> Expectation:
    """Cardinality guard — a categorical column silently exploding is
    the classic upstream-schema-drift symptom."""
    m = F.countDistinct(F.col(col)).cast("double")
    return Expectation(
        name or f"distinct_count({col})",
        m,
        lambda x: x <= F.lit(float(limit)),
    )


def expectations(
    checks: Sequence[Expectation],
) -> Callable[[DataFrame], DataFrame]:
    """Evaluate every expectation in one aggregation pass and return the
    per-constraint report ``(constraint, metric, passed)``."""

    def _t(df: DataFrame) -> DataFrame:
        agg = df.agg(
            *[
                c.metric.cast("double").alias(f"_m{i}")
                for i, c in enumerate(checks)
            ]
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("constraint"),
                    F.col(f"_m{i}").alias("metric"),
                    c.passed(F.col(f"_m{i}")).alias("passed"),
                )
                for i, c in enumerate(checks)
            ]
        )
        return agg.select(F.explode(rows).alias("_e")).select("_e.*")

    return _t
