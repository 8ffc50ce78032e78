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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
            h = _mix(i ^ (partition.seed << 32))
            state = _STATES[h % len(_STATES)]
            county = f"{state[:4]}_county_{(h >> 8) % 50}"
            day = (h >> 16) % 365
            aqi = float((h >> 24) % 501)
            param = _PARAMS[(h >> 40) % len(_PARAMS)]
            yield (
                i,
                state,
                county,
                _EPOCH + timedelta(days=day),
                aqi,
                param,
            )


class AQIGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aqi_gen"

    def schema(self):
        return AQI_GEN_SCHEMA

    def reader(self, schema):
        return AQIGenReader(self.options)
