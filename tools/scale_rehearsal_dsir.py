#!/usr/bin/env python
"""DSIR importance-weight scale rehearsal beyond the driver's SFs.

Same deterministic corpus protocol as scale_rehearsal_bm25.py
(60-token docs over a 5k-word xxhash64 vocab, no RNG), with every
20th doc assigned to the benchmark target source so the target model
is non-degenerate. What this probes: DSIR's cost drivers are (a) the
hashed-bigram explode (~59 rows/doc — corpus-linear by construction)
and (b) the (doc, bucket) aggregate; the model/total tables are
bounded by DSIR_BUCKETS regardless of corpus size, so per-doc cost
must hold ~flat across decades. A super-linear decade means the
feature shuffle sizing broke, not the math.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_dsir.py [n_docs] [cpus]
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

    from maillog2db_spark.operators import corpus_analytics as ca
    from maillog2db_spark.operators.decontam import BENCH_SOURCE
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_dsir", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    # the (doc, bucket) feature aggregate is the volume driver
    # (~59 rows/doc pre-aggregate) — same sizing rule as bm25/dedup
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
        F.when(F.col("id") % 20 == 0, F.lit(BENCH_SOURCE))
        .otherwise(F.lit("s1"))
        .alias("source"),
        F.expr(
            "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))

    d = tempfile.mkdtemp(prefix="dsir_rehearsal_")
    docs.write.parquet(f"{d}/documents.parquet")
    print(f"corpus: {n_docs} docs at {d}", flush=True)

    t0 = time.time()
    out = ca.dsir_weights(spark, d)
    # time an aggregate that READS the weight column: a bare count()
    # lets Catalyst eliminate the zero-fill left join entirely (unique
    # right key, no right columns referenced) and times only the doc
    # scan — the first version of this rehearsal reported a bogus
    # flat 2 s per decade exactly that way
    rows = (
        out.groupBy((F.col("source") == BENCH_SOURCE).alias("is_t"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("weight_ppm").alias("m"))
        .collect()
    )
    dt = time.time() - t0
    n = sum(r["n"] for r in rows)
    # semantic sanity at scale: target docs must out-score the rest
    means = {r["is_t"]: r["m"] for r in rows}
    assert means[True] > means[False], means
    print(
        f"dsir_weights: {dt:.1f} s for {n} docs "
        f"({dt / n_docs * 1e6:.1f} us/doc); "
        f"mean weight target={means[True]:.0f} raw={means[False]:.0f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
