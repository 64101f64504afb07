"""Batch end-to-end pipeline: raw lines → the four tables.

This is the reference's entire ingest loop (maillog2db.go:180-280) as
one lazy DAG; the streaming path (streaming.py) re-uses these exact
builders inside foreachBatch so batch ≡ streaming by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import parsing, tables


@dataclass
class MaillogTables:
    parsed: DataFrame
    logs: DataFrame
    clients: DataFrame
    messages: DataFrame
    deliveries: DataFrame


def process_lines(
    lines: DataFrame,
    value_col: str = "value",
    seq_col: str | None = None,
    year: int = 2024,
    strict_day: bool = True,
) -> MaillogTables:
    parsed = parsing.parse_lines(
        lines, value_col=value_col, seq_col=seq_col, year=year, strict_day=strict_day
    )
    return MaillogTables(
        parsed=parsed,
        logs=tables.build_logs(parsed),
        clients=tables.build_clients(parsed),
        messages=tables.build_messages(parsed),
        deliveries=tables.build_deliveries(parsed),
    )


def process_file(
    spark: SparkSession, path: str, year: int = 2024, strict_day: bool = True
) -> MaillogTables:
    """Batch/backfill entry: read a maillog file (or directory of rotated
    files) and build all four tables. Equivalent to the reference's
    replay-from-start restart behavior (maillog2db.go:168, README.md:28) —
    dedup/merge semantics make reprocessing idempotent."""
    lines = spark.read.text(path)
    return process_lines(lines, year=year, strict_day=strict_day)
