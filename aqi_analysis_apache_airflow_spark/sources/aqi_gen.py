"""Custom Python DataSource: deterministic synthetic AQI measurements.

PySpark 4's Python DataSource API is the engine-native way to add a
source the built-ins don't cover (the reference's only ingestion is CSV
files on disk; this adds a GENERATOR source for load/soak testing at
arbitrary scale without staging files).

Design for parallel scale, mirroring how a real connector should look:

- ``partitions()`` splits the keyspace into ``numPartitions`` row
  ranges — each executor task generates ONLY its slice, so a 10^12-row
  soak test is embarrassingly parallel with zero driver memory.
- rows are a pure function of the row index (xxhash-free Python-side
  LCG mixing — stdlib only), so any slice is reproducible
  independently of partitioning: the same (seed, row index) always
  yields the same measurement.
- the reader yields tuples (Arrow-batched by the runtime); no state.

Usage::

    spark.dataSource.register(AQIGenDataSource)
    df = (spark.read.format("aqi_gen")
          .option("numRows", 100_000)
          .option("numPartitions", 32)
          .load())
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

AQI_GEN_SCHEMA = StructType(
    [
        StructField("measurement_id", LongType()),
        StructField("state_name", StringType()),
        StructField("county_name", StringType()),
        StructField("measured_date", TimestampNTZType()),
        StructField("aqi_value", DoubleType()),
        StructField("defining_parameter", StringType()),
    ]
)

_STATES = ["Connecticut", "California", "Texas", "Vermont", "Ohio"]
_PARAMS = ["Ozone", "PM2.5", "PM10", "NO2", "CO"]
_EPOCH = datetime(2024, 1, 1)


def _mix(x: int) -> int:
    # splitmix64 finalizer — deterministic, stdlib-only
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(i: int, seed: int):
    """Row ``i`` under ``seed`` — pure function shared by the batch and
    stream readers, so a streamed prefix equals the batch slice."""
    h = _mix(i ^ (seed << 32))
    state = _STATES[h % len(_STATES)]
    return (
        i,
        state,
        f"{state[:4]}_county_{(h >> 8) % 50}",
        _EPOCH + timedelta(days=(h >> 16) % 365),
        float((h >> 24) % 501),
        _PARAMS[(h >> 40) % len(_PARAMS)],
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class AQIGenReader(DataSourceReader):
    def __init__(self, options):
        self.num_rows = int(options.get("numRows", "1000"))
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.seed = int(options.get("seed", "0"))

    def partitions(self):
        step = max(1, -(-self.num_rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.num_rows), self.seed)
            for lo in range(0, self.num_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)


class AQIGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic generator: the
    offset IS the row index, so exactly-once replay is trivial —
    ``readBetweenOffsets`` regenerates any batch bit-identically (the
    property a real source gets from Kafka offsets / file names, here
    from the pure row function). The simple-reader API suits bounded
    per-batch volumes (rows flow through the driver); a
    partition-parallel ``streamReader`` is the next step up, same
    offset contract."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", "100"))
        self.seed = int(options.get("seed", "0"))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = lo + self.rows_per_batch
        # a LIST, not a generator: the runtime pickles the prefetched
        # batch for possible replay, and generators don't pickle
        return [_row(i, self.seed) for i in range(lo, hi)], {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [_row(i, self.seed) for i in range(start["offset"], end["offset"])]


class AQIGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aqi_gen"

    def schema(self):
        return AQI_GEN_SCHEMA

    def reader(self, schema):
        return AQIGenReader(self.options)

    def simpleStreamReader(self, schema):
        return AQIGenStreamReader(self.options)
