#!/usr/bin/env python
"""End-to-end ingest decade: the flagship maillog pipeline (parse →
four table builders → parquet) measured at 1×, 10×, 100× the sf0.1
line volume (110k → 1.1M → 11M lines) — the whole-job rehearsal the
per-operator decades don't cover.

Line synthesis replicates the bench generator's events with event_id
AND user_id offsets, so message content diversity scales with volume
while the queueid space keeps the generator's 97-value cycle — which
makes the per-queueid correlation (J1) groups grow linearly with the
multiplier, a STRICTLY HARSHER skew than a real 100× corpus (where
queueids recycle but their count also grows). lines/s holding across
the decade under that handicap is the conservative claim.

Runs must be in ISOLATION (no concurrent Spark in the JVM/host) —
SCALING.md's recorded admissibility lesson.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_ingest.py [multipliers]
    (default "1,10,100")
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mults = [int(m) for m in (sys.argv[1] if len(sys.argv) > 1 else "1,10,100").split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from maillog2db_spark import io as mio
    from maillog2db_spark import pipeline, synth
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_ingest", cpus=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    events = mio.load_events(spark, sf_dir)
    spans = events.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    e_span, u_span = int(spans.e) + 1, int(spans.u) + 1

    for m in mults:
        # replicate events m× with disjoint event/user id blocks, then
        # run the SAME line construction as the bench generator
        reps = spark.range(m).select(F.col("id").alias("k"))
        ev_m = (
            events.crossJoin(F.broadcast(reps))
            .select(
                (F.col("event_id") + F.col("k") * e_span).alias("event_id"),
                (F.col("user_id") + F.col("k") * u_span).alias("user_id"),
                "ts",
            )
        )
        base = ev_m.selectExpr("event_id as seq", "event_id", "user_id", "ts")
        replay = ev_m.filter("event_id % 10 = 3").selectExpr(
            f"event_id + {synth.REPLAY_SEQ_OFFSET * m} as seq",
            "event_id", "user_id", "ts",
        )
        expr = synth.line_value_expr("spark")
        lines = (
            base.unionAll(replay)
            .repartition("seq")
            .selectExpr(
                "seq", f"element_at(shuffle(array({expr})), 1) as value"
            )
        )
        n = lines.count()
        results = []
        # 3-run protocol: discard run 1 (JIT/page-cache), report best
        # of runs 2-3 (the BENCH_r07 ingest protocol)
        for run in range(3):
            with tempfile.TemporaryDirectory() as td:
                t0 = time.time()
                t = pipeline.process_lines(
                    lines, seq_col="seq", year=synth.SYNTH_YEAR,
                    materialize=True,
                )
                tbls = [
                    ("logs", t.logs), ("clients", t.clients),
                    ("messages", t.messages), ("deliveries", t.deliveries),
                ]

                def w(args):
                    name, df = args
                    df.write.mode("overwrite").parquet(os.path.join(td, name))

                with ThreadPoolExecutor(max_workers=4) as ex:
                    for f in [ex.submit(w, a) for a in tbls]:
                        f.result()
                dt = time.time() - t0
                results.append(dt)
                print(
                    f"  m={m} run{run + 1}: {n} lines in {dt:.1f}s "
                    f"({n / dt:,.0f} lines/s)",
                    flush=True,
                )
        best = min(results[1:])
        print(
            f"m={m}: {n} lines, best-of-2-3 {best:.1f}s "
            f"-> {n / best:,.0f} lines/s "
            f"(runs {[round(r, 1) for r in results]})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
