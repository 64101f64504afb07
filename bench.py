#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is executed with a count() action (full plan runs, results
not pulled to the driver), twice; the reported time is the best of the
two runs — robust against transient host load and JVM JIT warmup while
still including plan compilation. A warmup job amortizes session
startup out of the numbers.

Measurement symmetry (round-6 change): ingest is measured FIRST, in
the fresh session — previously it ran once, cold, after the whole
suite, so its number moved with suite-induced memory/GC pressure
rather than code changes (the r5 "regression" was exactly that
asymmetry). Round-7 tightening: ingest runs THREE times, run 1 is
discarded (JIT/page-cache warmup — r6 saw a 1.7x spread between two
identical back-to-back runs), report best of runs 2-3; all raw runs
land in BENCH_DETAIL. BENCH_DETAIL.json additionally records both raw runs
per query (``queries_runs``): run 1 pays any shared session caches
(tokenizer/centroid/parse bases), run 2 rides them — the split makes
cache-attribution visible so a registry reorder can't masquerade as a
per-query regression. Round-9 MOVERS discipline: before accepting any
round-over-round per-query regression narrative, rerun the movers
through tools/bench_isolated.py (fresh-session isolated + primed
scenarios) and record the table in SCALING.md — the r8 embed-family
"regression" was driver-host variance, exonerated exactly this way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maillog2db_spark import queries as Q  # noqa: E402
from maillog2db_spark import synth  # noqa: E402
from maillog2db_spark.session import get_spark  # noqa: E402


def ingest_throughput(spark, sf_dir: str, out_dir: str) -> dict:
    """End-to-end ingest: synthesized maillog → parse → all four tables
    → parquet, measured as lines/sec. This is the reference's whole job
    (its implied rate: 2-4 serial SQL round trips per line); ours is one
    bounded set of shuffles per table — through the PRODUCT path:
    process_lines(materialize=True) runs the six-regex parse once for
    all four consumers, and the four independent writes submit
    concurrently (the write_canonical default). Round-6 measurement of
    the two together: 15.3k → 56.4k lines/s at sf0.1."""
    from concurrent.futures import ThreadPoolExecutor

    from maillog2db_spark import pipeline

    lines = synth.lines_df(spark, sf_dir)
    n = lines.count()
    t0 = time.time()
    t = pipeline.process_lines(
        lines, seq_col="seq", year=synth.SYNTH_YEAR, materialize=True
    )
    tbls = [("logs", t.logs), ("clients", t.clients),
            ("messages", t.messages), ("deliveries", t.deliveries)]

    def w(args):
        name, df = args
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))

    with ThreadPoolExecutor(max_workers=4) as ex:
        for f in [ex.submit(w, a) for a in tbls]:
            f.result()
    dt = time.time() - t0
    return {"lines": n, "sec": round(dt, 3), "lines_per_sec": round(n / dt)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("maillog2db_spark_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    import tempfile

    # ingest first — fresh session, 3-run protocol (round-7 change):
    # run 1 is DISCARDED (it pays JIT + page-cache warmup — r6 measured
    # a 1.7x spread between two back-to-back runs of identical code),
    # the reported number is best of runs 2-3, which agree to ~20%
    # making round-over-round ingest deltas attributable to code
    ingest_runs = []
    for _ in range(3):
        with tempfile.TemporaryDirectory() as td:
            ingest_runs.append(ingest_throughput(spark, sf_dir, td))
    ingest = max(ingest_runs[1:], key=lambda r: r["lines_per_sec"])
    ingest["runs_lines_per_sec"] = [r["lines_per_sec"] for r in ingest_runs]
    ingest["protocol"] = "discard run 1, best of runs 2-3"
    spark.catalog.clearCache()  # ingest's parse layer out of query runs

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    total = 0.0
    for name, q in Q.REGISTRY.items():
        try:
            runs = []
            for _ in range(2):
                t0 = time.time()
                q.fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            raw_runs[name] = runs  # [cold-ish, warm] — shared-cache
            # builds land in run 1; a best-of-2 delta vs last round
            # with run 2 flat is cache attribution, not regression
            dt = min(runs)
            timings[name] = dt
            total += dt
        except Exception as e:  # a failing query shouldn't kill the bench
            timings[name] = -1.0
            raw_runs[name] = [-1.0, -1.0]
            print(f"bench error in {name}: {e}", file=sys.stderr)

    # Two-tier output: the driver's capture keeps only ~2 KB of stdout
    # TAIL (round 1 lost the head of the line → unparseable artifact).
    # Full per-query detail goes to BENCH_DETAIL.json next to this
    # script; the stdout line stays under a byte budget by listing the
    # slowest queries first and dropping the fastest until it fits —
    # so it ALWAYS parses, and the detail file has the rest.
    detail = {
        "metric": "all-queries total sec, best of 2 runs each",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "avg_sec_per_query": round(total / max(len(timings), 1), 3),
        "queries": timings,
        "queries_runs": raw_runs,
        "ingest": ingest,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    budget = 1600
    by_cost = sorted(timings, key=lambda n: -timings[n])
    line_obj = dict(detail)
    line_obj.pop("queries_runs")  # detail-file only — never fits the line
    for keep in range(len(by_cost), -1, -1):
        line_obj["queries"] = {n: timings[n] for n in by_cost[:keep]}
        line_obj["queries_omitted"] = len(timings) - keep
        line_obj["detail_file"] = "BENCH_DETAIL.json"
        line = json.dumps(line_obj, separators=(",", ":"))
        if len(line) <= budget:
            break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
