#!/usr/bin/env python
"""BM25 retrieval scale rehearsal beyond the driver's SFs.

Same deterministic corpus protocol as scale_rehearsal.py (60-token
docs over a 5k-word xxhash64 vocab, no RNG). What this rehearsal
probes: BM25's candidate mass is the UNION OF POSTING LISTS of the
query docs' terms — with a Zipf-free uniform vocab every term's
posting list is ~n·60/5000 docs, so candidate volume is corpus-linear
by construction and the per-doc cost should hold flat across decades.
A super-linear decade here would mean the probe join or the two-phase
top-k stopped scaling, not the math.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_bm25.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.session import get_spark
    from maillog2db_spark.operators import text as tx

    spark = get_spark("scale_rehearsal_bm25", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    # same sizing rule as the dedup rehearsal: the (doc, term) tf
    # aggregate is the volume driver (~60 rows/doc)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, n_docs // 15_000))
    )

    base = spark.range(0, n_docs, 1, p)
    tok = (
        "concat('w', pmod(xxhash64(concat(cast(id as string), '_', "
        "cast(i as string))), 5000))"
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("s0").alias("source"),
        F.expr(
            "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))

    d = tempfile.mkdtemp(prefix="bm25_rehearsal_")
    docs.write.parquet(f"{d}/documents.parquet")
    print(f"corpus: {n_docs} docs at {d}", flush=True)

    timings: dict[str, float] = {}

    def stage(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        timings[name] = dt
        print(f"{name}: {dt:.1f} s — {out}", flush=True)

    # cold = includes the tf/df/dl build; warm re-run shows the probe
    # cost alone is NOT the bottleneck (Spark re-plans, no caching —
    # the delta is scan/page-cache warmup, the plan is identical)
    stage("bm25_topk cold", lambda: f"{tx.bm25_topk(spark, d).count()} rows")
    stage("bm25_topk warm", lambda: f"{tx.bm25_topk(spark, d).count()} rows")

    total = timings["bm25_topk warm"]
    print(
        f"TOTAL warm {total:.1f} s for {n_docs} docs "
        f"({total / n_docs * 1e6:.1f} us/doc)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
