"""CLI parity: reference flag surface (maillog2db.go:118-126) and the
end-to-end -once backfill path over a single tailed file."""

from __future__ import annotations

import pathlib
import subprocess
import sys

from maillog2db_spark import cli

FIXTURE = [
    "Aug 13 03:14:15 mx01 postfix/smtpd[12345]: 4BcD12x9: client=mail.example.org[192.0.2.10]",
    "Aug 13 03:14:16 mx01 postfix/qmgr[12346]: 4BcD12x9: from=<s@x>, size=2048, nrcpt=1 (queue active)",
    "Aug 13 03:14:17 mx01 postfix/smtp[12347]: 4BcD12x9: to=<r@y>, relay=mx.y[10.0.0.1]:25, "
    "delay=1.1, delays=0.1/0/0.5/0.5, dsn=2.0.0, status=sent (250 ok)",
]


def test_flag_surface_matches_reference():
    """Every reference flag parses with the reference's default, in both
    -flag and --flag spellings (Go's flag package accepts both)."""
    p = cli.build_parser()
    args = p.parse_args([])
    assert args.maillog == "/var/log/maillog"
    assert (args.dbhost, args.dbport, args.dbuser, args.dbpass, args.dbname) == (
        "localhost", 3306, "username", "password", "databasename",
    )
    assert args.debug is False
    single = p.parse_args(["-maillog", "/x", "-dbport", "3307", "-debug"])
    double = p.parse_args(["--maillog", "/x", "--dbport", "3307", "--debug"])
    assert single.maillog == double.maillog == "/x"
    assert single.dbport == double.dbport == 3307
    assert single.debug and double.debug
    assert cli.jdbc_url(single) == "jdbc:mysql://localhost:3307/databasename"


def test_cli_once_backfills_single_file(tmp_path):
    """`-maillog <file> -once`: tail-source backfill into the parquet
    store, then exit 0. The store must contain the parsed tables."""
    log = tmp_path / "maillog"
    log.write_text("\n".join(FIXTURE) + "\n")
    store = tmp_path / "store"
    r = subprocess.run(
        [
            sys.executable, "-m", "maillog2db_spark",
            "-maillog", str(log),
            "-store", str(store),
            "-checkpoint", str(tmp_path / "ckpt"),
            "-logfile", str(tmp_path / "prog.log"),
            "-year", "2026",
            "-once",
            "-cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    tables = {p.name for p in pathlib.Path(store).iterdir()}
    assert {"logs", "clients", "messages", "deliveries"} <= tables
    # spot-check content without spinning up a second SparkSession
    import duckdb

    con = duckdb.connect()
    n_logs = con.execute(f"SELECT count(*) FROM '{store}/logs/**/*.parquet'").fetchone()[0]
    msg = con.execute(
        f"SELECT message_queueid, message_size FROM '{store}/messages/**/*.parquet'"
    ).fetchall()
    assert n_logs == 3
    assert msg == [("4BcD12x9", "2048")]
    assert (tmp_path / "prog.log").read_text()  # S7 program-log sink wrote
