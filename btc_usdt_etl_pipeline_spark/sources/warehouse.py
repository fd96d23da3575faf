"""Warehouse sink + export (SURVEY.md §2A S10/S11).

The reference loads its aggregate into DuckDB (``duckdb_api.py:40-47``,
after a defensive copytree — anti-pattern §4.2-3) and exports via pandas
(``duckdb2csv.py:5-18``).  The engine's warehouse is the Spark SQL catalog:
Parquet-backed managed tables with idempotent dynamic-partition overwrite
(fixes the append-duplication anti-pattern §4.2-5).  DuckDB survives only
as the test oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_as_table(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Idempotent warehouse load.

    With ``partition_by`` and dynamic overwrite, re-running a month's load
    replaces exactly that month's partitions — reruns converge instead of
    duplicating (the reference's append bug, ``process_data.py:125``)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer = df.write.format("parquet").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)


def export_csv(
    spark: SparkSession, table: str, path: str, single_file: bool = True
) -> None:
    """Warehouse table → CSV for dashboards (S11 parity).

    ``coalesce(1)`` only when a single file is demanded (dashboard-sized
    outputs); large exports keep natural parallelism."""
    df = spark.table(table)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", "true").csv(path)
