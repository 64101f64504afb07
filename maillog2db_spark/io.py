"""Testdata table loaders.

``events.parquet`` is written with TIMESTAMP(NANOS), which Spark's
parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos
as LongType via the legacy conf and rebuild a microsecond timestamp
with floor division — exactly DuckDB's ns→us truncation, so oracle
comparisons stay bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        return load_events(spark, sf_dir)  # applies ensure_session_conf itself
    ensure_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_conf(spark)
    spark.conf.set(NANOS_CONF, "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # integer division — float division loses microsecond precision
        # at 1e18-nanosecond magnitudes (double has 53 mantissa bits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
