"""Property-based differential tests (SURVEY §5.2 item 3).

``_simulate`` is an independent pure-Python re-implementation of the
reference's sequential per-line fold (maillog2db.go:180-442): same
regexes, same first-match-wins routing, same dedup/upsert disciplines,
processed strictly in order. Hypothesis generates random event
interleavings — duplicates, replays, garbage, order permutations — and
the Spark builders must agree with the sequential fold exactly. This is
the strongest order-semantics check we have: any silent divergence of
the distributed merge from single-threaded file order shows up here.
"""

from __future__ import annotations

import re
from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from maillog2db_spark import pipeline

HEADER = re.compile(
    r"([a-zA-Z]{1,3}\s[0-9]{2}\s[0-9]{2}:[0-9]{2}:[0-9]{2})\s([\S]+)\s([\S]+)\[([0-9]{1,})\]:"
)
SMTPD = re.compile(r"([a-zA-Z0-9]+):\sclient=(.*)")
SMTP = re.compile(
    r"([a-zA-Z0-9]+|NOQUEUE):\sto=(.*?),\srelay=(.*?),\sdelay=(.*?),\sdelays=(.*?),\sdsn=(.*?),\sstatus=(.*?)\s(.*)"
)
QMGR = re.compile(r"([a-zA-Z0-9]+):\sfrom=(.*?),\ssize=([0-9]{1,}),\snrcpt=([0-9]{1,})\s(.*)")
CLEANUP = re.compile(r"([a-zA-Z0-9]+):\smessage-id=(.*)")
CSPLIT = re.compile(r"(.*?)\[(.*?)\]")

YEAR = 2025


def _simulate(lines: list[str]):
    """The reference's main loop, faithfully sequential."""
    logs, deliveries = [], []
    clients: dict[tuple, dict] = {}
    messages: dict[str, dict] = {}
    for line in lines:
        hm = HEADER.search(line)
        if not hm:
            continue  # admission filter, maillog2db.go:181-183
        ts = datetime.strptime(f"{YEAR} {hm.group(1)}", "%Y %b %d %H:%M:%S")
        mailhost, process, pid = hm.group(2), hm.group(3), hm.group(4)
        message = line.replace(hm.group(0), "").strip()
        row = (ts, mailhost, process, pid, message)
        if row not in logs:  # recordRawLogEntry dedup, :283-306
            logs.append(row)
        m = SMTPD.search(message)
        if m:  # smtpd branch, :200-213
            qid, client = m.group(1), m.group(2)
            cm = CSPLIT.search(client)
            if cm:
                key = (cm.group(0), cm.group(1), cm.group(2))
                clients.setdefault(key, {})["lastseen"] = ts  # :308-330
            messages.setdefault(qid, {})["client"] = client  # :360-376
            continue
        m = SMTP.search(message)
        if m:  # smtp branch, :215-238
            drow = (ts,) + m.groups()
            if drow not in deliveries:  # :395-442
                deliveries.append(drow)
            continue
        m = QMGR.search(message)
        if m:  # qmgr branch, :240-258
            d = messages.setdefault(m.group(1), {})
            d.update(
                ts=ts, mailhost=mailhost, frm=m.group(2), size=m.group(3),
                nrcpt=m.group(4), statusext=m.group(5),
            )
            continue
        m = CLEANUP.search(message)
        if m:  # cleanup branch, :260-268
            messages.setdefault(m.group(1), {})["message_id"] = m.group(2)
    return logs, clients, messages, deliveries


# --- random log generation --------------------------------------------------

QIDS = ["AA11", "BB22", "CC33"]
CLIENTS = ["h1.x[10.0.0.1]", "h2.x[10.0.0.2]:25", "h3.x[10.0.0.3]"]


@st.composite
def log_lines(draw):
    n = draw(st.integers(3, 25))
    lines = []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                [
                    "smtpd", "qmgr", "cleanup", "smtp", "noise", "garbage",
                    # fidelity edges (SURVEY §2.2 faithfulness notes):
                    "noqueue",     # real NOQUEUE reject: no to=/relay= → raw-log only
                    "padded_day",  # space-padded day: dropped by the strict header
                    "local",       # local(8) process with smtp line shape → still a delivery
                ]
            )
        )
        sec = draw(st.integers(0, 59))
        hdr = f"Aug 11 0{draw(st.integers(1, 9))}:00:{sec:02d} mx0 postfix/any[{draw(st.integers(1, 999))}]:"
        qid = draw(st.sampled_from(QIDS))
        if kind == "smtpd":
            lines.append(f"{hdr} {qid}: client={draw(st.sampled_from(CLIENTS))}")
        elif kind == "qmgr":
            lines.append(
                f"{hdr} {qid}: from=<s{draw(st.integers(0, 3))}@x>, size={draw(st.integers(1, 999))}, nrcpt=1 (queue active)"
            )
        elif kind == "cleanup":
            lines.append(f"{hdr} {qid}: message-id=<m{draw(st.integers(0, 9))}@x>")
        elif kind == "smtp":
            lines.append(
                f"{hdr} {qid}: to=<r@y>, relay=y[2.2.2.2]:25, delay=1.{draw(st.integers(0, 9))}, "
                "delays=0.1/0/0.5/0.5, dsn=2.0.0, status=sent (ok)"
            )
        elif kind == "noise":
            lines.append(f"{hdr} disconnect from h1.x[10.0.0.1]")
        elif kind == "noqueue":
            # reference's smtp regex requires to=/relay=; this must land
            # ONLY in the raw-log table (maillog2db.go:52, verified note)
            lines.append(f"{hdr} NOQUEUE: reject: RCPT from h1.x[10.0.0.1]: 554 denied")
        elif kind == "padded_day":
            # classic syslog single-digit day — strict header drops it
            lines.append(
                f"Aug  {draw(st.integers(1, 9))} 01:02:03 mx0 postfix/smtpd[1]: {qid}: client=h1.x[10.0.0.1]"
            )
        elif kind == "local":
            # routing is content-based only: a local(8) line with the
            # delivery shape is recorded as a delivery too
            lines.append(
                f"Aug 11 04:00:{sec:02d} mx0 postfix/local[77]: {qid}: to=<u@y>, relay=local, delay=0.1, "
                "delays=0.05/0/0/0.05, dsn=2.0.0, status=sent (delivered to mailbox)"
            )
        else:
            lines.append("totally unparseable garbage")
    # exact duplicates / replays
    for i in draw(st.lists(st.integers(0, n - 1), max_size=4)):
        lines.append(lines[i])
    return lines


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(log_lines())
def test_spark_builders_match_sequential_fold(spark_prop, lines):
    spark = spark_prop
    logs, clients, messages, deliveries = _simulate(lines)
    df = spark.createDataFrame(list(enumerate(lines)), ["seq", "value"])
    t = pipeline.process_lines(df, seq_col="seq", year=YEAR)

    assert sorted(tuple(r) for r in t.logs.collect()) == sorted(logs)
    assert sorted(tuple(r) for r in t.deliveries.collect()) == sorted(deliveries)

    got_clients = {(r[0], r[1], r[2]): r[3] for r in t.clients.collect()}
    assert got_clients == {k: v["lastseen"] for k, v in clients.items()}

    got_msgs = {
        r["message_queueid"]: (
            r["message_timestamp"], r["message_mailhost"], r["message_from"],
            r["message_size"], r["message_nrcpt"], r["message_statusext"],
            r["message_client"], r["message_id"],
        )
        for r in t.messages.collect()
    }
    exp_msgs = {
        q: (
            d.get("ts"), d.get("mailhost"), d.get("frm"), d.get("size"),
            d.get("nrcpt"), d.get("statusext"), d.get("client"), d.get("message_id"),
        )
        for q, d in messages.items()
    }
    assert got_msgs == exp_msgs

    # replay idempotence: processing the file twice ≡ once for every table
    twice = pipeline.process_lines(
        spark.createDataFrame(
            list(enumerate(lines + lines)), ["seq", "value"]
        ),
        seq_col="seq",
        year=YEAR,
    )
    assert sorted(tuple(r) for r in twice.logs.collect()) == sorted(logs)
    assert sorted(tuple(r) for r in twice.deliveries.collect()) == sorted(deliveries)
    assert {
        r["message_queueid"]: r["message_size"] for r in twice.messages.collect()
    } == {q: d.get("size") for q, d in messages.items()}


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark
