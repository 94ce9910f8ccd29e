"""Custom Python DataSource (PySpark 4 API): a deterministic synthetic
tick generator, `spark.read.format("tickgen")`.

Why it exists: (a) it exercises the Python DataSource surface — schema
declaration, driver-side partition planning, executor-side per-partition
generation — the same machinery a real custom connector (exchange API,
internal feed) would use; (b) it gives benchmarks and demos a
testdata-free input whose contents are a pure function of (seed, row
index): no RNG state, identical on every executor, run, and engine.

Options: rows (total), partitions (parallelism), tickers (symbol count),
seed. Each InputPartition carries only its [start, end) index range, so
generation is embarrassingly parallel and a 100-TB-scale synthetic load
is just `rows` with enough partitions — no driver materialization.
"""

from __future__ import annotations

import datetime
import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Knuth multiplicative constant — same engine-portable integer hashing
#: discipline as operators/training.py.
_KNUTH = 2654435761
_BASE_TS = datetime.datetime(2024, 3, 14, 0, 0, 0)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _u32(seed: int, i: int) -> int:
    """Deterministic 32-bit value from (seed, index) — md5-derived, the
    same no-RNG trick as the LSH hyperplanes."""
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]
    return int(h, 16)


def tick_row(seed: int, i: int, tickers: int) -> tuple:
    u = _u32(seed, i)
    ticker = f"T{(i * _KNUTH) % (2**32) % tickers:03d}-USDT"
    price = round(100.0 + (u % 10_000) / 100.0, 2)
    size = round(1.0 + ((u >> 8) % 1_000) / 10.0, 1)
    ts = _BASE_TS + datetime.timedelta(seconds=i % 86_400)
    return (ticker, i, price, size, ts)


class TickGenDataSource(DataSource):
    """`format("tickgen")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tickgen"

    def schema(self) -> str:
        return (
            "ticker string, sequence long, price double, size double, "
            "ts timestamp"
        )

    def reader(self, schema) -> "TickGenReader":
        return TickGenReader(self.options)

    def simpleStreamReader(self, schema) -> "TickGenStreamReader":
        return TickGenStreamReader(self.options)


class TickGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        self.tickers = max(1, int(options.get("tickers", 16)))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[_Range]:
        if self.rows <= 0:
            # rows=0 is a legal empty load — without this guard the ceil
            # step is 0 and range(0, 0, 0) raises ValueError. One empty
            # range, not []: the engine still schedules a task when the
            # partition list is empty and hands read() a None partition.
            return [_Range(0, 0)]
        step = -(-self.rows // self.n_parts)  # ceil division
        return [
            _Range(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield tick_row(self.seed, i, self.tickers)


class TickGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming half (`spark.readStream.format("tickgen")`): a
    deterministic rate-like source — each micro-batch emits the next
    `rows_per_batch` indexes of the SAME (seed, index) tick function the
    batch reader uses, so a streaming pipeline's input is replayable
    byte-for-byte. Offsets are plain row indexes ({"index": n}), which
    makes exactly-once restart semantics trivially auditable:
    readBetweenOffsets(start, end) regenerates [start, end) identically
    on replay."""

    def __init__(self, options: dict):
        # floor 1: a zero batch size would make every trigger an empty
        # batch and availableNow would never terminate usefully
        self.rows_per_batch = max(1, int(options.get("rows_per_batch", 100)))
        self.tickers = max(1, int(options.get("tickers", 16)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple:
        lo = int(start["index"])
        hi = lo + self.rows_per_batch
        # lists, not generators: the engine's prefetch cache copies the
        # returned iterator, and generators aren't copyable
        rows = [tick_row(self.seed, i, self.tickers) for i in range(lo, hi)]
        return rows, {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            tick_row(self.seed, i, self.tickers)
            for i in range(int(start["index"]), int(end["index"]))
        ]


def register(spark) -> None:
    """Idempotently register the source; after this,
    `spark.read.format("tickgen").option("rows", n).load()` works."""
    spark.dataSource.register(TickGenDataSource)
