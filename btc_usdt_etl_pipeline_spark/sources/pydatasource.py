"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic klines.

The reference fakes inputs by downloading real Binance zips in CI
(``components/ingest_data.py``); a load/perf harness wants unbounded,
reproducible input with NO I/O at all.  This source generates
Binance-shaped OHLCV rows arithmetically, straight into the scan:

- **Partition-aware**: ``partitions()`` splits the row range into
  contiguous slices, one per task — generation is executor-side and
  embarrassingly parallel, the driver only plans ranges.  At 100 TB
  equivalents you scale by raising ``partitions``; there is no file
  listing, no shuffle, no driver materialization.
- **Deterministic**: row i is a pure function of i (same sawtooth
  price walk as the test fixture) — two scans are bit-identical, so
  perf runs are comparable and correctness tests can assert exact
  values.
- Registered per-session: ``spark.dataSource.register(
  SyntheticKlinesDataSource)`` then
  ``spark.read.format("synthetic_klines").option("rows", 1e6).load()``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

SCHEMA = (
    "open_time long, open double, high double, low double, "
    "close double, volume double, number_of_trades long"
)


def kline_row(i: int, start_ms: int, step_ms: int) -> tuple:
    """Deterministic kline i — same shape as tests/conftest.make_klines."""
    t = start_ms + i * step_ms
    px = 100.0 + (i % 7) - (i % 3)
    return (
        t,
        px,
        px + 1.0,
        px - 1.0,
        px + 0.5,
        float(10 + i % 5),
        1 + i % 4,
    )


class SyntheticKlinesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(float(options.get("rows", 1000)))
        self.start_ms = int(options.get("start_ms", 1_700_000_000_000))
        self.step_ms = int(options.get("step_ms", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        if self.rows <= 0:
            return [InputPartition((0, 0))]
        n = max(1, min(self.n_parts, self.rows))
        step = -(-self.rows // n)  # ceil-div: last slice ragged
        return [
            InputPartition((lo, min(lo + step, self.rows)))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield kline_row(i, self.start_ms, self.step_ms)


class SyntheticKlinesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_klines"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticKlinesReader:  # noqa: ARG002
        return SyntheticKlinesReader(self.options)
