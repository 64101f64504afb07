"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over maillog2db_spark.queries — the registry of (Spark
callable, DuckDB oracle SQL) pairs covering SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maillog2db_spark import queries as _q  # noqa: E402
from maillog2db_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: synthesize a Postfix maillog from the
    events table, run the full parse → merge → join pipeline, and report
    delivery-attempt counts per (status, sender)."""
    configure_session(spark)
    return _q.ml_msg_delivery_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
