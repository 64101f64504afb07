"""Golden-output parse tests — every fixture line from FIXTURES.md §1,
each pinning a verified reference semantic (regexes executed against
/root/reference/maillog2db.go:44-59 during the survey)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from maillog2db_spark import parsing, pipeline

FIXTURE_LINES = [
    # 0: smtpd branch
    "Aug 13 03:14:15 mx01 postfix/smtpd[12345]: 4BcD12x9: client=mail.example.org[192.0.2.10]",
    # 1: qmgr branch
    "Aug 13 03:14:16 mx01 postfix/qmgr[12346]: 4BcD12x9: from=<sender@example.org>, size=2048, nrcpt=1 (queue active)",
    # 2: cleanup branch
    "Aug 13 03:14:16 mx01 postfix/cleanup[12347]: 4BcD12x9: message-id=<20260813031415.AB12@example.org>",
    # 3: smtp branch
    "Aug 13 03:14:18 mx01 postfix/smtp[12348]: 4BcD12x9: to=<user@example.com>, relay=mx.example.net[198.51.100.5]:25, delay=1.2, delays=0.5/0.01/0.3/0.4, dsn=2.0.0, status=sent (250 2.0.0 OK queued as XYZ)",
    # 4: default branch (header matches, no sub-regex)
    "Aug 13 03:14:19 mx01 postfix/smtpd[12345]: disconnect from mail.example.org[192.0.2.10]",
    # 5: no header at all → dropped
    "this line has no syslog header at all",
    # 6: single-digit space-padded day → dropped under strict_day (reference), kept lenient
    "Aug  3 03:14:15 mx01 postfix/smtpd[12345]: 4BcD12x9: client=mail.example.org[192.0.2.10]",
    # 7: exact duplicate of 3 → one logs row, one deliveries row
    "Aug 13 03:14:18 mx01 postfix/smtp[12348]: 4BcD12x9: to=<user@example.com>, relay=mx.example.net[198.51.100.5]:25, delay=1.2, delays=0.5/0.01/0.3/0.4, dsn=2.0.0, status=sent (250 2.0.0 OK queued as XYZ)",
    # 8: retry at later ts → SEPARATE deliveries row
    "Aug 13 03:44:18 mx01 postfix/smtp[12348]: 4BcD12x9: to=<user@example.com>, relay=mx.example.net[198.51.100.5]:25, delay=1801, delays=1800/0.01/0.3/0.4, dsn=4.4.1, status=deferred (connect timed out)",
    # 9: cleanup first for a new queueid → messages row w/ only queueid+message_id
    "Aug 13 04:00:00 mx01 postfix/cleanup[12347]: 7NeW99z1: message-id=<first@example.org>",
    # 10: client with suffix after ] → clients stores truncated, messages keeps full
    "Aug 13 04:00:01 mx01 postfix/smtpd[12345]: 7NeW99z1: client=relay.example.net[203.0.113.7]:10025",
    # 11: same client as 0 reappears → ONE clients row, lastseen advanced
    "Aug 13 05:00:00 mx01 postfix/smtpd[12345]: 8QqQ88y2: client=mail.example.org[192.0.2.10]",
    # 12: delivery-shaped line from non-smtp process → still a delivery (content-based routing)
    "Aug 13 05:00:02 mx01 postfix/local[12349]: 8QqQ88y2: to=<local@mx01>, relay=local, delay=0.1, delays=0.05/0/0/0.05, dsn=2.0.0, status=sent (delivered to mailbox)",
    # 13: NOQUEUE reject without to=/relay= shape → raw-log only
    "Aug 13 05:00:03 mx01 postfix/smtpd[12345]: NOQUEUE: reject: RCPT from unknown[203.0.113.9]: 554 5.7.1 blocked",
]

YEAR = 2026


def _lines_df(spark, lines=FIXTURE_LINES):
    return spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], "seq long, value string"
    )


def _tables(spark, strict_day=True):
    return pipeline.process_lines(
        _lines_df(spark), seq_col="seq", year=YEAR, strict_day=strict_day
    )


def test_admission_and_routing(spark):
    parsed = parsing.parse_lines(_lines_df(spark), seq_col="seq", year=YEAR)
    rows = {r["seq"]: r for r in parsed.collect()}
    # line 5 (no header) and 6 (single-digit day, strict) are dropped
    assert set(rows) == {0, 1, 2, 3, 4, 7, 8, 9, 10, 11, 12, 13}
    assert rows[0]["entry_type"] == "smtpd"
    assert rows[1]["entry_type"] == "qmgr"
    assert rows[2]["entry_type"] == "cleanup"
    assert rows[3]["entry_type"] == "smtp"
    assert rows[4]["entry_type"] == "other"
    assert rows[13]["entry_type"] == "other"  # NOQUEUE reject doesn't match smtp regex
    assert rows[12]["entry_type"] == "smtp"  # content-based: local process, delivery shape
    assert rows[0]["mailhost"] == "mx01"
    assert rows[0]["process"] == "postfix/smtpd"
    assert rows[0]["pid"] == "12345"
    assert rows[0]["message"] == "4BcD12x9: client=mail.example.org[192.0.2.10]"
    assert rows[0]["ts"] == dt.datetime(YEAR, 8, 13, 3, 14, 15)


def test_lenient_day_compat_flag(spark):
    parsed = parsing.parse_lines(_lines_df(spark), seq_col="seq", year=YEAR, strict_day=False)
    seqs = {r["seq"] for r in parsed.select("seq").collect()}
    assert 6 in seqs  # space-padded day admitted under the compat flag
    row6 = parsed.filter(F.col("seq") == 6).collect()[0]
    assert row6["ts"] == dt.datetime(YEAR, 8, 3, 3, 14, 15)


def test_logs_dedup(spark):
    t = _tables(spark)
    logs = t.logs.collect()
    # 12 admitted lines, line 7 is an exact dup of line 3 → 11 rows
    assert len(logs) == 11
    msgs = [r["log_message"] for r in logs]
    assert len(set(msgs)) == 11


def test_clients(spark):
    t = _tables(spark)
    clients = {(r["client"], r["client_rdns"], r["client_addr"]): r for r in t.clients.collect()}
    # two distinct client triples: mail.example.org (seen twice) + relay.example.net
    assert set(clients) == {
        ("mail.example.org[192.0.2.10]", "mail.example.org", "192.0.2.10"),
        ("relay.example.net[203.0.113.7]", "relay.example.net", "203.0.113.7"),
    }
    mail = clients[("mail.example.org[192.0.2.10]", "mail.example.org", "192.0.2.10")]
    # lastseen advanced to the re-occurrence at 05:00:00 (line 11)
    assert mail["client_lastseen"] == dt.datetime(YEAR, 8, 13, 5, 0, 0)
    assert mail["client_firstseen"] == dt.datetime(YEAR, 8, 13, 3, 14, 15)
    assert mail["client_seen_count"] == 2


def test_messages_merge(spark):
    t = _tables(spark)
    msgs = {r["message_queueid"]: r for r in t.messages.collect()}
    assert set(msgs) == {"4BcD12x9", "7NeW99z1", "8QqQ88y2"}

    m1 = msgs["4BcD12x9"]
    assert m1["message_from"] == "<sender@example.org>"
    assert m1["message_size"] == "2048"
    assert m1["message_nrcpt"] == "1"
    assert m1["message_statusext"] == "(queue active)"
    assert m1["message_client"] == "mail.example.org[192.0.2.10]"
    assert m1["message_id"] == "<20260813031415.AB12@example.org>"
    assert m1["message_timestamp"] == dt.datetime(YEAR, 8, 13, 3, 14, 16)  # qmgr event ts
    assert m1["message_mailhost"] == "mx01"

    # cleanup-first queueid: only message_id populated; smtpd later adds the
    # FULL raw client string (suffix :10025 preserved — maillog2db.go:213)
    m2 = msgs["7NeW99z1"]
    assert m2["message_id"] == "<first@example.org>"
    assert m2["message_client"] == "relay.example.net[203.0.113.7]:10025"
    assert m2["message_from"] is None
    assert m2["message_timestamp"] is None  # no qmgr event seen

    m3 = msgs["8QqQ88y2"]
    assert m3["message_client"] == "mail.example.org[192.0.2.10]"


def test_deliveries_dedup_and_retry(spark):
    t = _tables(spark)
    rows = t.deliveries.orderBy("delivery_timestamp").collect()
    # line 3 + dup line 7 collapse; retry line 8 distinct; local line 12 distinct
    assert len(rows) == 3
    sent = rows[0]
    assert sent["delivery_queueid"] == "4BcD12x9"
    assert sent["delivery_to"] == "<user@example.com>"
    assert sent["delivery_relay"] == "mx.example.net[198.51.100.5]:25"
    assert sent["delivery_delay"] == "1.2"
    assert sent["delivery_delays"] == "0.5/0.01/0.3/0.4"
    assert sent["delivery_dsn"] == "2.0.0"
    assert sent["delivery_status"] == "sent"
    assert sent["delivery_statusext"] == "(250 2.0.0 OK queued as XYZ)"
    retry = rows[1]
    assert retry["delivery_status"] == "deferred"
    assert retry["delivery_dsn"] == "4.4.1"


def test_last_writer_wins_order_sensitivity(spark):
    """Two qmgr events for one queueid — the later seq wins every qmgr field."""
    lines = [
        "Aug 13 03:00:00 mx01 postfix/qmgr[1]: QQ11: from=<a@x>, size=100, nrcpt=1 (queue active)",
        "Aug 13 03:00:05 mx01 postfix/qmgr[1]: QQ11: from=<b@y>, size=200, nrcpt=2 (queue active)",
    ]
    t = pipeline.process_lines(_lines_df(spark, lines), seq_col="seq", year=YEAR)
    row = t.messages.collect()[0]
    assert row["message_from"] == "<b@y>"
    assert row["message_size"] == "200"
    # reversed order → first line's values win
    rev = spark.createDataFrame(
        [(1, lines[0]), (0, lines[1])], "seq long, value string"
    )
    t2 = pipeline.process_lines(rev, seq_col="seq", year=YEAR)
    row2 = t2.messages.collect()[0]
    assert row2["message_from"] == "<a@x>"


def test_replay_idempotence(spark):
    """Processing the file twice (replay-from-start) ≡ processing once."""
    doubled = FIXTURE_LINES + FIXTURE_LINES
    t1 = _tables(spark)
    t2 = pipeline.process_lines(_lines_df(spark, doubled), seq_col="seq", year=YEAR)
    for a, b in [(t1.logs, t2.logs), (t1.deliveries, t2.deliveries)]:
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert t1.clients.count() == t2.clients.count()
    assert t1.messages.count() == t2.messages.count()


def test_typed_columns(spark):
    from maillog2db_spark import tables as tb

    t = _tables(spark)
    d = tb.with_delivery_typed_columns(t.deliveries)
    row = d.filter(F.col("delivery_delay") == "1.2").collect()[0]
    assert row["delivery_delay_sec"] == 1.2
    assert row["delivery_delays_arr"] == [0.5, 0.01, 0.3, 0.4]
    m = tb.with_message_typed_columns(t.messages)
    row = m.filter(F.col("message_queueid") == "4BcD12x9").collect()[0]
    assert row["message_size_long"] == 2048
    assert row["message_nrcpt_int"] == 1
