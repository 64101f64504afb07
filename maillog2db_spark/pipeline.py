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
    materialize: bool = False,
) -> MaillogTables:
    """``materialize=True`` runs the six-regex parse ONCE
    (localCheckpoint) instead of once per consuming table — the four
    builders each traverse the parse lineage, so a backfill that
    realizes all four tables otherwise pays the regex pass 4×
    (measured 15.3k → 33.0k lines/s on the sf0.1 ingest benchmark;
    the streaming path already persists its per-batch parse the same
    way). Default stays lazy: single-table consumers and tests that
    inspect plans want the unmaterialized lineage."""
    parsed = parsing.parse_lines(
        lines, value_col=value_col, seq_col=seq_col, year=year, strict_day=strict_day
    )
    if materialize:
        parsed = parsed.localCheckpoint(eager=True)
    return MaillogTables(
        parsed=parsed,
        logs=tables.build_logs(parsed),
        clients=tables.build_clients(parsed),
        messages=tables.build_messages(parsed),
        deliveries=tables.build_deliveries(parsed),
    )


def process_file(
    spark: SparkSession, path: str, year: int = 2024, strict_day: bool = True,
    materialize: bool = False,
) -> MaillogTables:
    """Batch/backfill entry: read a maillog file (or directory of rotated
    files) and build all four tables. Equivalent to the reference's
    replay-from-start restart behavior (maillog2db.go:168, README.md:28) —
    dedup/merge semantics make reprocessing idempotent."""
    lines = spark.read.text(path)
    return process_lines(
        lines, year=year, strict_day=strict_day, materialize=materialize
    )
