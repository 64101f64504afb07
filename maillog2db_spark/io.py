"""Testdata table loaders.

Timestamp fidelity is normalized HERE, at the one chokepoint every query
loads through, because the driver regenerates the parquet between rounds
and the physical type has already changed once:

  * round 1: ``events.ts`` was TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as
    LongType via the legacy conf and rebuild a microsecond timestamp
    with floor division — exactly DuckDB's ns→us truncation.
  * round 2+: timestamps are plain TIMESTAMP_NTZ (isAdjustedToUTC=false
    micros). Functions like ``unix_micros`` and streaming watermarks
    require TIMESTAMP (LTZ), so NTZ columns are cast. With the session
    timezone pinned to UTC (ensure_session_conf) the cast is a
    wall-clock identity, so values stay bit-identical to the DuckDB
    oracle, which reads the same files as naive timestamps.

Both paths are kept so the loaders work against either generation of
the testdata — queries must run correctly in ANY caller session,
including the driver's default-config one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def ensure_session_conf(spark: SparkSession) -> None:
    """Runtime conf every query depends on, applied at the load chokepoint
    so correctness holds in ANY caller-provided session (the driver runs
    queries() without necessarily calling entry()/configure_session):
    UTC pins epoch-based window/date results to the DuckDB oracle's
    timezone; the excluded rule is the InferFiltersFromGenerate
    pathology documented in session.py. Caller-set rule exclusions are
    preserved (union, not overwrite)."""
    from .session import EXCLUDED_OPTIMIZER_RULES

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    current = ""
    try:
        current = spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    except Exception:
        pass
    rules = [r for r in current.split(",") if r]
    for r in EXCLUDED_OPTIMIZER_RULES.split(","):
        if r not in rules:
            rules.append(r)
    spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a raw events ``ts`` column to TIMESTAMP (LTZ) whatever
    physical shape the parquet carries: nanos-as-long (round-1 files read
    under the legacy conf) → floor-divide to micros; TIMESTAMP_NTZ
    (round-2+ files) → cast (wall-clock identity under the UTC session).
    Works on both batch and streaming DataFrames — the streaming tests
    use it on a readStream relation."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (LTZ). Under the UTC
    session timezone this preserves the wall-clock value exactly; it
    restores the column type the whole engine (unix_micros arithmetic,
    F.window, watermarks) was built and oracle-verified against."""
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        return load_events(spark, sf_dir)  # applies ensure_session_conf itself
    ensure_session_conf(spark)
    return _normalize_timestamps(spark.read.parquet(f"{sf_dir}/{table}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_conf(spark)
    spark.conf.set(NANOS_CONF, "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # integer division — float division loses microsecond precision
        # at 1e18-nanosecond magnitudes (double has 53 mantissa bits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df)
