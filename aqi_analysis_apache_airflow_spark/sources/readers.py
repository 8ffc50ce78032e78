"""Scans / sources (reference ops S1-S4, SURVEY.md §2.1).

The reference enumerates ``10_state_aqi_*.csv`` files with an
``os.listdir`` + prefix/suffix loop and reads each with
``pd.read_csv`` one at a time (``dags/etl/source_to_stage.py:50-53``),
fully materializing a year in RAM per iteration. Here a single schema'd
``spark.read.csv`` with ``pathGlobFilter`` replaces the loop: Spark
splits files into tasks, streams them, and Catalyst pushes projections
and (for parquet) predicates into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import AQI_RAW_SCHEMA, COUNTIES_RAW_SCHEMA


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver-corpus table (columnar, pushdown-capable).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects ([PARQUET_TYPE_ILLEGAL]). We flip the legacy conf to
    read it as raw nanos and truncate to microsecond TIMESTAMP_NTZ with
    exact integer arithmetic (``div 1000`` — never double division,
    which loses sub-microsecond precision near 2^53). The conf is
    runtime-settable and harmless for the other tables.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_aqi_csv_glob(spark: SparkSession, source_dir: str) -> DataFrame:
    """S1+S2: one scan over every ``10_state_aqi_*.csv`` in ``source_dir``.

    Replaces the per-file loop at ``dags/etl/source_to_stage.py:50-53``.
    Explicit schema (no pandas-style inference); header row honored.
    ``Created``/``Last Updated`` are read as strings and coerced by the
    projection layer, mirroring the reference's post-hoc
    ``pd.to_datetime`` (``source_to_stage.py:71-72``).
    """
    return (
        spark.read.schema(AQI_RAW_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "10_state_aqi_*.csv")
        .csv(source_dir)
    )


def read_counties_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: the static counties master (``dags/etl/source_to_stage.py:88-91``)."""
    return spark.read.schema(COUNTIES_RAW_SCHEMA).option("header", True).csv(path)


def jdbc_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Validated option dict for a parallel JDBC scan/write.

    The scale rule this enforces: a JDBC read WITHOUT
    ``partitionColumn/lowerBound/upperBound/numPartitions`` is a single
    connection pulling the whole table through one task — fine for a
    control row, catastrophic for a fact table. Either pass all four or
    none (Spark itself half-validates this at .load() time; failing
    here keeps the error next to the caller).
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"jdbc url must start with 'jdbc:', got {url!r}")
    bounds = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(b is not None for b in bounds) and any(b is None for b in bounds):
        raise ValueError(
            "partition_column, lower_bound, upper_bound, num_partitions "
            "must be passed together (or all omitted for a 1-task read "
            "of a small control table)"
        )
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(extra or {})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """True-Postgres-parity source (SURVEY.md §1.5): the reference
    stores every table in Postgres via SQLAlchemy ORM
    (``dags/etl/models.py:7-12``); this engine's sanctioned mapping is
    the parquet warehouse, so JDBC is the opt-in variant for reading an
    existing Postgres deployment. Kwargs go to :func:`jdbc_options`;
    requires the JDBC driver jar on the Spark classpath (not shipped in
    this image — config-gated, exercised via option-assembly tests)."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


def write_jdbc(
    df: DataFrame, *, mode: str = "append", batch_size: int = 10_000, **kwargs
) -> None:
    """JDBC sink twin of :func:`read_jdbc`. ``batchsize`` batches the
    INSERTs exactly like the reference's 10k-row flush
    (``dags/etl/load_to_db.py``); ``mode='overwrite'`` with
    ``truncate=true`` in ``extra`` maps the reference's
    truncate-and-reload tables (S7) without dropping indexes."""
    opts = jdbc_options(**kwargs)
    opts["batchsize"] = str(batch_size)
    df.write.format("jdbc").options(**opts).mode(mode).save()
