"""CLI with the reference's exact flag surface (maillog2db.go:118-126).

A user of the reference switches by swapping the binary:

    python -m maillog2db_spark -maillog /var/log/maillog \\
        -dbhost db -dbport 3306 -dbuser u -dbpass p -dbname m2db -mirror

Flag-for-flag parity (`-maillog -logfile -dbhost -dbport -dbuser
-dbpass -dbname -debug`, both single- and double-dash accepted, same
defaults), with the engine differences made explicit:

  * The CANONICAL store is parquet (`-store`), not MySQL — MySQL
    becomes an optional mirror (`-mirror` + the db flags), because at
    100 TB the relational sink is a serving surface, not the store.
  * `-maillog` pointing at a FILE follows it at append granularity
    (custom tail source — the reference's contract); pointing at a
    DIRECTORY follows new files (the logrotate drop-zone contract).
  * `-once` backfills everything currently present and exits
    (availableNow) — the reference's replay-from-start restart,
    de-duplicated by the same merge discipline.
  * `-year` pins the syslog-year inference (the reference uses
    wall-clock year, maillog2db.go:445 — an injectable parameter here
    so replays of old logs don't shift dates).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _flag(parser: argparse.ArgumentParser, name: str, **kw) -> None:
    parser.add_argument(f"-{name}", f"--{name}", **kw)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="maillog2db_spark", add_help=True,
        description="PySpark-native maillog ingestion engine (reference-flag compatible)",
    )
    cwd = os.getcwd()
    _flag(p, "maillog", default="/var/log/maillog",
          help="Path To Maillog (file = tail mode, directory = drop-zone mode). Default: /var/log/maillog")
    _flag(p, "logfile", default=f"{cwd}/pfmaillog2db.log", help="Path To Program Logfile")
    _flag(p, "dbhost", default="localhost", help="Database Host")
    _flag(p, "dbport", type=int, default=3306, help="Database Port")
    _flag(p, "dbuser", default="username", help="Database Username")
    _flag(p, "dbpass", default="password", help="Database Password")
    _flag(p, "dbname", default="databasename", help="Database Name")
    _flag(p, "debug", action="store_true", help="Debug Output. Default: false")
    # engine-side additions (not in the reference)
    _flag(p, "store", default=f"{cwd}/pfmaillog2db_store", help="Canonical parquet store dir")
    _flag(p, "checkpoint", default=f"{cwd}/pfmaillog2db_ckpt", help="Streaming checkpoint dir")
    _flag(p, "mirror", action="store_true",
          help="Mirror each batch into MySQL via JDBC using the db flags")
    _flag(p, "once", action="store_true", help="Backfill existing input, then exit")
    _flag(p, "year", type=int, default=None,
          help="Year for syslog timestamps (default: current year, like the reference)")
    _flag(p, "trigger", default=None, help="processingTime trigger, e.g. '10 seconds'")
    _flag(p, "cpus", type=int, default=None, help="local[N] parallelism")
    return p


def jdbc_url(args: argparse.Namespace) -> str:
    return f"jdbc:mysql://{args.dbhost}:{args.dbport}/{args.dbname}"


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(filename=args.logfile, level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("maillog2db_spark")

    from .session import get_spark
    from . import streaming

    spark = get_spark("maillog2db_spark", cpus=args.cpus)
    year = args.year
    if year is None:
        import datetime

        year = datetime.date.today().year  # reference behavior (maillog2db.go:445)
    tail = os.path.isfile(args.maillog)
    mirror = None
    if args.mirror:
        mirror = {"url": jdbc_url(args), "user": args.dbuser, "password": args.dbpass}
    log.info("ingest start: input=%s tail=%s store=%s once=%s mirror=%s",
             args.maillog, tail, args.store, args.once, bool(mirror))

    if args.debug:
        # S8: per-line parsed-field dump, reference -debug parity
        from . import parsing

        dbg = (
            streaming.read_stream_lines(spark, args.maillog, tail_file=tail)
            .writeStream.foreachBatch(
                lambda df, bid: parsing.parse_lines(df, year=year).show(truncate=False)
            )
            .option("checkpointLocation", args.checkpoint + "_debug")
            .queryName("maillog_debug")
        )
        (dbg.trigger(availableNow=True) if args.once else dbg).start()

    q = streaming.start_ingest(
        spark,
        args.maillog,
        args.store,
        args.checkpoint,
        year=year,
        available_now=args.once,
        processing_time=args.trigger,
        jdbc_mirror=mirror,
        tail_file=tail,
    )
    q.awaitTermination()
    for other in spark.streams.active:
        other.awaitTermination()
    log.info("ingest done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
