"""Sink tests: DDL/upsert SQL parity and the canonical parquet layout.

No MySQL exists in this environment, so the JDBC path is verified at
the SQL-generation and writer-configuration level; the parquet
canonical store is verified end-to-end including partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from maillog2db_spark import pipeline, sinks

LOG = [
    "Aug 11 01:00:01 mx01 postfix/smtpd[101]: AAAA1111: client=one.example.org[10.0.0.1]",
    "Aug 12 02:00:04 mx01 postfix/smtp[104]: AAAA1111: to=<r@y>, relay=y[2.2.2.2]:25, delay=1.1, delays=0.1/0/0.5/0.5, dsn=2.0.0, status=sent (ok)",
    "Aug 13 03:00:04 mx01 postfix/smtp[105]: AAAA1111: to=<r@y>, relay=y[2.2.2.2]:25, delay=2.0, delays=1/0/0.5/0.5, dsn=2.0.0, status=sent (ok)",
]


def test_create_table_column_types_matches_reference_widths():
    ddl = sinks.create_table_column_types("deliveries")
    # struct-tag widths from maillog2db.go:97-110, untagged -> 255
    assert "delivery_queueid VARCHAR(16)" in ddl
    assert "delivery_dsn VARCHAR(25)" in ddl
    assert "delivery_statusext VARCHAR(255)" in ddl
    assert sinks.create_table_column_types("messages").startswith(
        "message_timestamp DATETIME"
    )


def test_mysql_upsert_sql_shapes():
    # keyed table: non-key columns updated on conflict
    sql = sinks.mysql_upsert_sql("messages")
    assert "INSERT INTO pfmaillog2db_messages" in sql
    assert "ON DUPLICATE KEY UPDATE" in sql
    # field groups merge NULL-preservingly (a qmgr-only batch row must
    # not erase the smtpd-group columns already in the mirror)
    assert "message_from = COALESCE(VALUES(message_from), message_from)" in sql
    assert "message_queueid = VALUES" not in sql  # key never updated
    assert "row_created_at = VALUES" not in sql  # created-at set once
    assert "row_updated_at = VALUES(row_updated_at)" in sql
    # full-payload-dedup table: update arm is just the audit stamp
    sql = sinks.mysql_upsert_sql("logs")
    assert "log_message = VALUES" not in sql
    assert "row_updated_at = VALUES(row_updated_at)" in sql


def test_jdbc_writer_configuration(spark):
    df = spark.createDataFrame([("x",)], ["log_message"])
    w = sinks.jdbc_writer(df, "jdbc:mysql://db/maillog", "logs", "u", "p")
    # writer is configured for the reference table name; saving without a
    # live DB must fail at connection, not configuration
    assert w is not None


def test_canonical_store_partition_pruning(spark, tmp_path):
    lines = spark.createDataFrame([(i, l) for i, l in enumerate(LOG)], ["seq", "value"])
    t = pipeline.process_lines(lines, seq_col="seq", year=2025)
    out = str(tmp_path / "canon")
    sinks.write_canonical(
        spark, out, logs=t.logs, clients=t.clients, messages=t.messages, deliveries=t.deliveries
    )
    # layout: one directory per event date
    days = sorted(e for e in os.listdir(os.path.join(out, "deliveries")) if "=" in e)
    assert days == ["delivery_date=2025-08-12", "delivery_date=2025-08-13"]
    # a date-filtered read prunes to one partition directory
    d = spark.read.parquet(os.path.join(out, "deliveries"))
    one_day = d.filter(F.col("delivery_date") == "2025-08-13")
    assert one_day.count() == 1
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(delivery_date" in plan
    # entity tables round-trip
    assert spark.read.parquet(os.path.join(out, "messages")).count() == 1
    assert spark.read.parquet(os.path.join(out, "clients")).count() == 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT an exchange —
    the plan proof that pre-bucketing removes the join shuffle."""
    from maillog2db_spark import pipeline

    lines = spark.createDataFrame(
        [(i, l) for i, l in enumerate(LOG * 3)], ["seq", "value"]
    )
    t = pipeline.process_lines(lines, seq_col="seq", year=2025)
    spark.sql("DROP TABLE IF EXISTS b_messages")
    spark.sql("DROP TABLE IF EXISTS b_deliveries")
    sinks.write_bucketed(t.messages, "b_messages", "message_queueid", 4)
    sinks.write_bucketed(t.deliveries, "b_deliveries", "delivery_queueid", 4)
    try:
        m = spark.table("b_messages")
        d = spark.table("b_deliveries")
        joined = d.hint("merge").join(
            m, d.delivery_queueid == m.message_queueid
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_messages")
        spark.sql("DROP TABLE IF EXISTS b_deliveries")
