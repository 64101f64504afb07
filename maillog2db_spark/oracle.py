"""DuckDB oracle SQL for the maillog pipeline.

Pure-SQL re-statement of parsing.py + tables.py over the synthesized
maillog (synth.lines_cte), used as the driver's t2 oracle and by
tools/oracle_check.py locally. The regex patterns are embedded verbatim
(DuckDB single-quoted strings have no backslash escapes, so the exact
RE2 patterns from parsing.py work unmodified; all six were verified
RE2-compatible in SURVEY §2.6 F4).

Engine-equivalence notes:
  * regexp_extract(s, pat, n) — both engines return '' on no-match and
    support group 0 = whole match.
  * replace / trim — replace-all + strip-spaces in both.
  * arg_max(x, ord) ≡ Spark max_by(x, ord): rows with NULL ord ignored.
  * try_strptime ≡ try_to_timestamp: NULL on parse failure.
"""

from __future__ import annotations

from . import parsing, synth

_PARSE_CTES = f"""
lines AS (
  {synth.lines_cte()}
),
admitted AS (
  SELECT seq, value,
         regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 1) AS ts_raw,
         regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 2) AS mailhost,
         regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 3) AS process,
         regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 4) AS pid,
         trim(replace(value, regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 0), '')) AS message
  FROM lines
  WHERE regexp_matches(value, '{parsing.HEADER_RE_STRICT}')
),
parsed AS (
  SELECT seq, ts_raw, mailhost, process, pid, message,
         try_strptime('{synth.SYNTH_YEAR} ' || regexp_replace(trim(ts_raw), '\\s+', ' ', 'g'),
                      '%Y %b %d %H:%M:%S') AS ts,
         CASE WHEN regexp_matches(message, '{parsing.SMTPD_RE}') THEN 'smtpd'
              WHEN regexp_matches(message, '{parsing.SMTP_RE}') THEN 'smtp'
              WHEN regexp_matches(message, '{parsing.QMGR_RE}') THEN 'qmgr'
              WHEN regexp_matches(message, '{parsing.CLEANUP_RE}') THEN 'cleanup'
              ELSE 'other' END AS entry_type
  FROM admitted
)"""


def parse_sql(select: str) -> str:
    """WITH <parse pipeline> SELECT ..."""
    return f"WITH {_PARSE_CTES}\n{select}"


PARSED = parse_sql(
    "SELECT seq, ts_raw, mailhost, process, pid, message, ts, entry_type FROM parsed"
)

ROUTER_COUNTS = parse_sql(
    "SELECT entry_type, count(*) AS n FROM parsed GROUP BY entry_type"
)

LOGS = parse_sql("""
SELECT DISTINCT ts AS log_timestamp, mailhost AS log_mailhost, process AS log_process,
       pid AS log_processid, message AS log_message
FROM parsed""")

CLIENTS = parse_sql(f"""
, smtpd AS (
  SELECT seq, ts,
         regexp_extract(regexp_extract(message, '{parsing.SMTPD_RE}', 2), '{parsing.CLIENT_SPLIT_RE}', 0) AS client,
         regexp_extract(regexp_extract(message, '{parsing.SMTPD_RE}', 2), '{parsing.CLIENT_SPLIT_RE}', 1) AS client_rdns,
         regexp_extract(regexp_extract(message, '{parsing.SMTPD_RE}', 2), '{parsing.CLIENT_SPLIT_RE}', 2) AS client_addr
  FROM parsed WHERE entry_type = 'smtpd'
)
SELECT client, client_rdns, client_addr,
       arg_max(ts, seq) AS client_lastseen,
       min(ts) AS client_firstseen,
       count(*) AS client_seen_count
FROM smtpd GROUP BY client, client_rdns, client_addr""")

MESSAGES = parse_sql(f"""
, ml AS (
  SELECT seq, ts, mailhost, entry_type,
         CASE WHEN entry_type = 'smtpd' THEN regexp_extract(message, '{parsing.SMTPD_RE}', 1)
              WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 1)
              ELSE regexp_extract(message, '{parsing.CLEANUP_RE}', 1) END AS queueid,
         CASE WHEN entry_type = 'smtpd' THEN regexp_extract(message, '{parsing.SMTPD_RE}', 2) END AS client_raw,
         CASE WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 2) END AS from_raw,
         CASE WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 3) END AS size_raw,
         CASE WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 4) END AS nrcpt_raw,
         CASE WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 5) END AS statusext_raw,
         CASE WHEN entry_type = 'cleanup' THEN regexp_extract(message, '{parsing.CLEANUP_RE}', 2) END AS message_id_raw
  FROM parsed WHERE entry_type IN ('smtpd', 'qmgr', 'cleanup')
)
SELECT queueid AS message_queueid,
       arg_max(ts, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_timestamp,
       arg_max(mailhost, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_mailhost,
       arg_max(from_raw, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_from,
       arg_max(size_raw, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_size,
       arg_max(nrcpt_raw, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_nrcpt,
       arg_max(statusext_raw, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_statusext,
       arg_max(client_raw, CASE WHEN entry_type = 'smtpd' THEN seq END) AS message_client,
       arg_max(message_id_raw, CASE WHEN entry_type = 'cleanup' THEN seq END) AS message_id
FROM ml GROUP BY queueid""")

_DELIVERY_CTE = f"""
, smtp AS (
  SELECT DISTINCT
         ts AS delivery_timestamp,
         regexp_extract(message, '{parsing.SMTP_RE}', 1) AS delivery_queueid,
         regexp_extract(message, '{parsing.SMTP_RE}', 2) AS delivery_to,
         regexp_extract(message, '{parsing.SMTP_RE}', 3) AS delivery_relay,
         regexp_extract(message, '{parsing.SMTP_RE}', 4) AS delivery_delay,
         regexp_extract(message, '{parsing.SMTP_RE}', 5) AS delivery_delays,
         regexp_extract(message, '{parsing.SMTP_RE}', 6) AS delivery_dsn,
         regexp_extract(message, '{parsing.SMTP_RE}', 7) AS delivery_status,
         regexp_extract(message, '{parsing.SMTP_RE}', 8) AS delivery_statusext
  FROM parsed WHERE entry_type = 'smtp'
)"""

DELIVERIES = parse_sql(_DELIVERY_CTE + "\nSELECT * FROM smtp")

DELIVERY_TYPED = parse_sql(_DELIVERY_CTE + """
SELECT delivery_queueid, delivery_timestamp, delivery_delay, delivery_delays,
       try_cast(delivery_delay AS DOUBLE) AS delivery_delay_sec,
       len(string_split(delivery_delays, '/')) AS delivery_delays_n,
       round(list_sum(list_transform(string_split(delivery_delays, '/'),
                                     x -> try_cast(x AS DOUBLE))), 6) AS delivery_delays_total
FROM smtp""")

ADMISSION_STATS = f"""
WITH lines AS (
  {synth.lines_cte()}
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN regexp_matches(value, '{parsing.HEADER_RE_STRICT}') THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(sum(CASE WHEN regexp_matches(value, '{parsing.HEADER_RE_STRICT}') THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN regexp_matches(value, '{parsing.HEADER_RE_STRICT}')
                 AND try_strptime('{synth.SYNTH_YEAR} ' ||
                       regexp_replace(trim(regexp_extract(value, '{parsing.HEADER_RE_STRICT}', 1)), '\\s+', ' ', 'g'),
                       '%Y %b %d %H:%M:%S') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
FROM lines
"""

MSG_DELIVERY_JOIN = parse_sql(f"""
, ml AS (
  SELECT seq, entry_type,
         CASE WHEN entry_type = 'smtpd' THEN regexp_extract(message, '{parsing.SMTPD_RE}', 1)
              WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 1)
              ELSE regexp_extract(message, '{parsing.CLEANUP_RE}', 1) END AS queueid,
         CASE WHEN entry_type = 'qmgr' THEN regexp_extract(message, '{parsing.QMGR_RE}', 2) END AS from_raw
  FROM parsed WHERE entry_type IN ('smtpd', 'qmgr', 'cleanup')
),
messages AS (
  SELECT queueid AS message_queueid,
         arg_max(from_raw, CASE WHEN entry_type = 'qmgr' THEN seq END) AS message_from
  FROM ml GROUP BY queueid
){_DELIVERY_CTE}
SELECT d.delivery_status, m.message_from, count(*) AS n_attempts
FROM smtp d JOIN messages m ON m.message_queueid = d.delivery_queueid
GROUP BY d.delivery_status, m.message_from""")


RELAY_LATENCY = parse_sql(_DELIVERY_CTE + """
SELECT delivery_relay,
       count(*) AS n_attempts,
       CAST(sum(CASE WHEN delivery_status = 'sent' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sent,
       round(avg(try_cast(delivery_delay AS DOUBLE)), 6) AS mean_delay,
       round(quantile_cont(try_cast(delivery_delay AS DOUBLE), 0.5), 4) AS p50_delay,
       round(quantile_cont(try_cast(delivery_delay AS DOUBLE), 0.9), 4) AS p90_delay,
       round(max(try_cast(delivery_delay AS DOUBLE)), 6) AS max_delay
FROM smtp
GROUP BY delivery_relay""")


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

# NB: DuckDB regexp_replace replaces only the FIRST match without the
# 'g' flag; Spark's replaces all — the flag keeps the twins identical.
PII_SCRUB = f"""
WITH lines AS (
  {synth.lines_cte()}
)
SELECT seq,
       CAST(len(regexp_extract_all(value, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(value, '{_IPV4_RE}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(value, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_IPV4_RE}', '<IP>', 'g')) AS scrub_md5
FROM lines
"""
