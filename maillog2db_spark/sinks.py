"""Sinks: canonical parquet store + JDBC/MySQL mirror (SURVEY §2.1 S4-S6).

The reference's only sink is four MySQL tables created by GORM
AutoMigrate (maillog2db.go:163-166) and maintained row-at-a-time with
SELECT-then-upsert (maillog2db.go:283-442). Spark-side that splits into:

  * a CANONICAL analytical store — date-partitioned parquet (the table
    a 1000-executor cluster actually queries; partition pruning on the
    event date is what keeps 100 TB scans bounded), and
  * an optional JDBC MIRROR reproducing the reference's MySQL surface —
    identical table names, column names and VARCHAR widths (DDL parity
    with the struct tags at maillog2db.go:61-110), written per
    micro-batch as one bulk staged upsert instead of 2-4 round trips
    per line.

JDBC at scale: `numPartitions` bounds concurrent connections (the
reference hardcodes a 50/200 pool it never uses concurrently,
maillog2db.go:148-149); writes go to a staging table then one
`INSERT ... ON DUPLICATE KEY UPDATE` / `MERGE` statement server-side,
which is idempotent per batch — re-delivery after a failure converges
(ST5). No MySQL is present in this environment, so connection-level
code is exercised only through the SQL/DDL generators + writer
configuration, all unit-tested.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- DDL parity with the reference structs (maillog2db.go:61-110) ----------
# GORM renders snake_case columns and pluralized pf-prefixed table names
# (SURVEY §1.1); untagged Go strings default to varchar(255).

REFERENCE_TABLE_NAMES = {
    "logs": "pfmaillog2db_logs",
    "clients": "pfmaillog2db_clients",
    "messages": "pfmaillog2db_messages",
    "deliveries": "pfmaillog2db_deliveries",
}

REFERENCE_COLUMN_TYPES: dict[str, dict[str, str]] = {
    "logs": {
        "log_timestamp": "DATETIME",
        "log_mailhost": "VARCHAR(100)",
        "log_process": "VARCHAR(100)",
        "log_processid": "VARCHAR(100)",
        "log_message": "VARCHAR(500)",
    },
    "clients": {
        "client": "VARCHAR(500)",
        "client_rdns": "VARCHAR(255)",
        "client_addr": "VARCHAR(50)",
        "client_lastseen": "DATETIME",
    },
    "messages": {
        "message_timestamp": "DATETIME",
        "message_mailhost": "VARCHAR(255)",
        "message_queueid": "VARCHAR(16)",
        "message_from": "VARCHAR(100)",
        "message_size": "VARCHAR(50)",
        "message_nrcpt": "VARCHAR(50)",
        "message_client": "VARCHAR(500)",
        "message_statusext": "VARCHAR(255)",
        "message_id": "VARCHAR(500)",
    },
    "deliveries": {
        "delivery_timestamp": "DATETIME",
        "delivery_queueid": "VARCHAR(16)",
        "delivery_to": "VARCHAR(100)",
        "delivery_relay": "VARCHAR(100)",
        "delivery_delay": "VARCHAR(50)",
        "delivery_delays": "VARCHAR(50)",
        "delivery_dsn": "VARCHAR(25)",
        "delivery_status": "VARCHAR(50)",
        "delivery_statusext": "VARCHAR(255)",
    },
}

# natural upsert keys (the reference's WHERE-conjunction columns)
UPSERT_KEYS: dict[str, list[str]] = {
    "logs": list(REFERENCE_COLUMN_TYPES["logs"]),          # full payload (dedup)
    "clients": ["client", "client_rdns", "client_addr"],
    "messages": ["message_queueid"],
    "deliveries": list(REFERENCE_COLUMN_TYPES["deliveries"]),  # full payload
}


def create_table_column_types(table: str) -> str:
    """The `createTableColumnTypes` JDBC writer option value — Spark
    renders these types into its CREATE TABLE, reproducing AutoMigrate's
    DDL (S6)."""
    return ", ".join(f"{c} {t}" for c, t in REFERENCE_COLUMN_TYPES[table].items())


def with_audit_columns(df: DataFrame) -> DataFrame:
    """A4: RowCreatedAt/RowUpdatedAt are processing-time audit stamps
    (maillog2db.go:299,326,...); applied at sink time."""
    now = F.current_timestamp()
    return df.withColumn("row_created_at", now).withColumn("row_updated_at", now)


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    num_partitions: int = 8,
    isolation_level: str = "READ_COMMITTED",
):
    """Configured JDBC DataFrameWriter for a mirror table (S4). Caller
    picks .mode(...)/.save(); `numPartitions` bounds concurrent
    connections the way the reference's pool cap intended."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", REFERENCE_TABLE_NAMES[table])
        .option("user", user)
        .option("password", password)
        .option("numPartitions", num_partitions)
        .option("isolationLevel", isolation_level)
        .option("createTableColumnTypes", create_table_column_types(table))
    )


def mysql_upsert_sql(table: str, staging: str | None = None) -> str:
    """One server-side bulk upsert from a staging table — the set
    EXCEPT-oriented replacement for the reference's per-row
    SELECT-then-INSERT/UPDATE (maillog2db.go:283-306 et al.):

      INSERT INTO <target> (cols) SELECT cols FROM <staging>
      ON DUPLICATE KEY UPDATE <non-key cols>, row_updated_at = NOW()

    For the append+dedup tables every payload column is in the unique
    key, so the UPDATE arm degenerates to refreshing row_updated_at —
    exact-duplicate suppression server-side, idempotent under batch
    re-delivery."""
    target = REFERENCE_TABLE_NAMES[table]
    staging = staging or f"{target}_staging"
    cols = list(REFERENCE_COLUMN_TYPES[table]) + ["row_created_at", "row_updated_at"]
    keys = set(UPSERT_KEYS[table])
    # messages: each event type carries only its own field group (other
    # columns NULL) — a bare overwrite would erase previously-merged
    # groups, so non-key columns merge NULL-preservingly (the server-side
    # equivalent of the reference's per-group record functions,
    # maillog2db.go:332-393)
    if table == "messages":
        updates = [
            f"{c} = COALESCE(VALUES({c}), {c})"
            for c in cols
            if c not in keys and c not in ("row_created_at", "row_updated_at")
        ]
        updates.append("row_updated_at = VALUES(row_updated_at)")
    else:
        updates = [
            f"{c} = VALUES({c})" for c in cols if c not in keys and c != "row_created_at"
        ]
    return (
        f"INSERT INTO {target} ({', '.join(cols)})\n"
        f"SELECT {', '.join(cols)} FROM {staging}\n"
        f"ON DUPLICATE KEY UPDATE {', '.join(updates)}"
    )


def foreach_batch_jdbc_merge(url: str, user: str, password: str, table: str):
    """foreachBatch sink factory for the streaming JDBC mirror (S5):
    write the micro-batch to a staging table (overwrite), then execute
    one upsert statement. The staging write + server-side MERGE pair is
    the standard exactly-once-convergent JDBC pattern — Spark's JDBC
    sink alone is append-only and not transactional across batches."""
    stmt = mysql_upsert_sql(table)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        staged = with_audit_columns(batch_df)
        (
            jdbc_writer(staged, url, f"{table}", user, password)
            .option("dbtable", f"{REFERENCE_TABLE_NAMES[table]}_staging")
            .mode("overwrite")
            .save()
        )
        # one server-side statement; Py4J-free portable path would use a
        # JDBC connection via the driver — stubbed without a live MySQL
        spark = batch_df.sparkSession
        _execute_jdbc_statement(spark, url, user, password, stmt)

    return _sink


def _execute_jdbc_statement(
    spark: SparkSession, url: str, user: str, password: str, stmt: str
) -> None:
    """Run one statement over JDBC through the JVM driver manager."""
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        conn.createStatement().executeUpdate(stmt)
    finally:
        conn.close()


# --- bucketed tables (shuffle-free co-located joins) ------------------------


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a Spark-native BUCKETED managed table: rows are
    hash-clustered (and optionally sorted) by the join key at write
    time, so equi-joins and aggregations between tables bucketed the
    same way need NO shuffle at read time — at 100 TB, pre-bucketing
    messages and deliveries on queueid turns the flagship join from a
    full two-sided exchange into a zip of co-located buckets. (The
    streaming state store implements the same idea manually with
    partition dirs; this is the SQL-catalog flavor for batch marts.)"""
    w = df.write.mode("overwrite").format("parquet")
    if sort_col:
        w = w.bucketBy(n_buckets, bucket_col).sortBy(sort_col)
    else:
        w = w.bucketBy(n_buckets, bucket_col)
    w.saveAsTable(table_name)


# --- canonical parquet store (the analytical side) -------------------------


def write_canonical(
    spark: SparkSession,
    out_dir: str,
    logs: DataFrame | None = None,
    clients: DataFrame | None = None,
    messages: DataFrame | None = None,
    deliveries: DataFrame | None = None,
    mode: str = "overwrite",
) -> None:
    """Date-partitioned parquet canonical tables. Event-dated tables
    (logs, deliveries) partition by their event date — the 100 TB query
    pattern is time-ranged, and partition pruning turns those scans into
    day-slices. Entity tables (clients, messages) are small-cardinality
    rollups; they write unpartitioned (their scale is keys, not events).
    """
    if logs is not None:
        (
            logs.withColumn("log_date", F.to_date("log_timestamp"))
            .write.mode(mode)
            .partitionBy("log_date")
            .parquet(os.path.join(out_dir, "logs"))
        )
    if deliveries is not None:
        (
            deliveries.withColumn("delivery_date", F.to_date("delivery_timestamp"))
            .write.mode(mode)
            .partitionBy("delivery_date")
            .parquet(os.path.join(out_dir, "deliveries"))
        )
    if clients is not None:
        clients.write.mode(mode).parquet(os.path.join(out_dir, "clients"))
    if messages is not None:
        messages.write.mode(mode).parquet(os.path.join(out_dir, "messages"))
