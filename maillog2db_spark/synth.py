"""Deterministic maillog synthesizer over the driver's ``events`` table.

The driver's correctness gate (t2) compares each declared query against
a DuckDB oracle over the same parquet tables. The reference engine's
core capability is *maillog parsing/merging*, which has no parquet
input — so we synthesize a Postfix maillog deterministically from the
``events`` table with integer-arithmetic-only templates, emitted
TWICE from the same template spec:

  * as a Spark SQL expression (``lines_df``) feeding the real pipeline
    (parsing.py / tables.py), and
  * as a DuckDB SQL CTE (``lines_cte``) feeding a pure-SQL re-statement
    of the pipeline (``oracle.py``).

Both engines then parse and aggregate independently; hash-equality of
the results is an end-to-end differential test of the entire engine
(admission filter, header extraction, router, all four table builders,
ordering semantics).

Template rules, from events(event_id e, ts, user_id u):
  branch  = e % 5    → 0 smtpd · 1 qmgr · 2 cleanup · 3 smtp · 4 noise
  garbage = e % 31 == 0 → headerless line (exercises the admission filter)
  queueid = 'Q' || (u % 97)        (~97 hot queueids → heavy keyed merge)
  replay  = every line with e % 10 == 3 is appended again with
            seq = e + 10_000_000   (exercises dedup / replay idempotence)
  smtpd client gets a ':2525' suffix when u % 4 == 0 (exercises the
            clientsplit prefix-truncation semantics, maillog2db.go:208-213)

Everything is modular arithmetic + fixed strings + second-granularity
timestamp formatting — no floats, no locale, no randomness — so the two
dialects produce byte-identical lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import io

SYNTH_YEAR = 2024
REPLAY_SEQ_OFFSET = 10_000_000


def _cast_str(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"cast(({expr}) as string)"
    return f"cast(({expr}) as varchar)"


def _ts_fmt(dialect: str) -> str:
    # 'Aug 13 03:14:15' — month abbrev, zero-padded day, seconds floor.
    if dialect == "spark":
        return "date_format(ts, 'MMM dd HH:mm:ss')"
    return "strftime(ts, '%b %d %H:%M:%S')"


def line_value_expr(dialect: str) -> str:
    """SQL expression producing the synthesized log line for one events
    row, in the given dialect ('spark' | 'duckdb')."""
    s = lambda e: _cast_str(dialect, e)  # noqa: E731
    qid = f"'Q' || {s('user_id % 97')}"
    header = (
        f"{_ts_fmt(dialect)} || ' mx' || {s('user_id % 3')} || ' ' || "
        "(CASE event_id % 5 WHEN 1 THEN 'postfix/qmgr' WHEN 2 THEN 'postfix/cleanup' "
        "WHEN 3 THEN 'postfix/smtp' ELSE 'postfix/smtpd' END) || "
        f"'[' || {s('100 + user_id % 50')} || ']: '"
    )
    smtpd_body = (
        f"{qid} || ': client=host' || {s('user_id % 20')} || '.example.org[192.0.2.' || "
        f"{s('user_id % 200')} || ']' || (CASE WHEN user_id % 4 = 0 THEN ':2525' ELSE '' END)"
    )
    qmgr_body = (
        f"{qid} || ': from=<s' || {s('user_id % 40')} || '@example.org>, size=' || "
        f"{s('500 + event_id % 5000')} || ', nrcpt=' || {s('1 + user_id % 4')} || ' (queue active)'"
    )
    cleanup_body = f"{qid} || ': message-id=<m' || {s('event_id % 1000')} || '@example.org>'"
    status = (
        "(CASE WHEN user_id % 10 < 7 THEN 'sent' WHEN user_id % 10 < 9 THEN 'deferred' ELSE 'bounced' END)"
    )
    dsn = (
        "(CASE WHEN user_id % 10 < 7 THEN '2.0.0' WHEN user_id % 10 < 9 THEN '4.4.1' ELSE '5.0.0' END)"
    )
    statusext = (
        f"(CASE WHEN user_id % 10 < 7 THEN '250 2.0.0 OK queued as X' || {s('event_id % 50')} "
        "WHEN user_id % 10 < 9 THEN 'connect timed out' ELSE '550 rejected' END)"
    )
    smtp_body = (
        f"{qid} || ': to=<u' || {s('user_id % 60')} || '@example.com>, relay=relay' || "
        f"{s('user_id % 5')} || '.example.net[198.51.100.' || {s('user_id % 50')} || ']:25, "
        f"delay=' || {s('event_id % 120')} || '.' || {s('user_id % 10')} || ', "
        f"delays=0.' || {s('user_id % 10')} || '/0.01/0.3/' || {s('event_id % 9')} || '.5, "
        f"dsn=' || {dsn} || ', status=' || {status} || ' (' || {statusext} || ')'"
    )
    noise_body = (
        f"'disconnect from host' || {s('user_id % 20')} || '.example.org[192.0.2.' || "
        f"{s('user_id % 200')} || ']'"
    )
    body = (
        f"(CASE event_id % 5 WHEN 0 THEN {smtpd_body} WHEN 1 THEN {qmgr_body} "
        f"WHEN 2 THEN {cleanup_body} WHEN 3 THEN {smtp_body} ELSE {noise_body} END)"
    )
    return (
        f"(CASE WHEN event_id % 31 = 0 THEN 'malformed line ' || {s('event_id')} "
        f"ELSE {header} || {body} END)"
    )


def lines_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized maillog as a DataFrame (seq BIGINT, value STRING),
    including the replay-duplicate tail — the Spark half of the twin.

    Two plan-shape measures keep the big line-construction CASE from
    destroying downstream plans (measured: whole-stage codegen fell back
    to interpreted for EVERY ml_* query without them):

    1. The exchange sits BELOW the CASE and carries only the raw integer
       columns, so the expensive string construction runs on all cores
       after the shuffle instead of on the (single-partition) parquet
       scan.
    2. ``value`` is wrapped in a 1-element shuffle(array(..)) — a no-op
       marked non-deterministic — so Catalyst neither collapses the CASE
       into every downstream regexp reference (~10 recomputed copies,
       >64KB generated code → interpreted fallback) nor pushes the
       admission rlike below the exchange into the scan. A real engine
       reads `value` from storage and needs no such barrier; this is
       purely a property of synthesizing the input inside the query.
    """
    events = io.load_events(spark, sf_dir)
    base = events.selectExpr("event_id as seq", "event_id", "user_id", "ts")
    replay = events.filter("event_id % 10 = 3").selectExpr(
        f"event_id + {REPLAY_SEQ_OFFSET} as seq", "event_id", "user_id", "ts"
    )
    raw = base.unionAll(replay).repartition("seq")
    expr = line_value_expr("spark")
    return raw.selectExpr("seq", f"element_at(shuffle(array({expr})), 1) as value")


def lines_cte(table: str = "events") -> str:
    """The identical synthesized maillog as a DuckDB CTE body — the
    oracle half of the twin."""
    expr = line_value_expr("duckdb")
    return (
        f"SELECT event_id AS seq, {expr} AS value FROM {table}\n"
        f"  UNION ALL\n"
        f"  SELECT event_id + {REPLAY_SEQ_OFFSET} AS seq, {expr} AS value "
        f"FROM {table} WHERE event_id % 10 = 3"
    )
