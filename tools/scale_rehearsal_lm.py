#!/usr/bin/env python
"""Bigram-LM family rehearsal beyond the driver's SFs: per-doc LM
scoring (doc_bigram_lm_score) and the min-k% tail (doc_mink_prob).

Same deterministic corpus protocol as scale_rehearsal_bm25 (60-token
docs over a 5k-word xxhash64 vocab, no RNG). Cost model under test:
the bigram stream is ~59 rows/doc (corpus-linear); the model tables
(bigram counts capped at vocab² = 25M, context and unigram counts at
vocab) grow toward saturation and are NOT broadcastable — the scoring
joins are term-keyed shuffles of the corpus-sized stream against the
model. A flat per-doc decade means those joins stay stream-grain; a
rising one means a model-side table leaked into a corpus-sized
re-shuffle (the BM25 dl-join class of bug). The min-k% delta on top of
the LM rollup is the doc-partitioned rank window — doc-length-bounded
per partition, so its cost must track the stream, not the corpus.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_lm.py [n_docs] [cpus]
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
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_lm", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
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
        F.expr(
            "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s0").alias("source"),
    ).withColumn("n_chars", F.length("text"))

    d = tempfile.mkdtemp(prefix="lm_rehearsal_")
    docs.write.parquet(f"{d}/documents.parquet")
    print(f"corpus: {n_docs} docs at {d}", flush=True)

    for name, fn in (
        ("bigram_lm_score", ca.bigram_lm_score),
        ("mink_prob", ca.mink_prob),
    ):
        for run in ("cold", "warm"):
            t0 = time.time()
            n = fn(spark, d).count()
            dt = time.time() - t0
            print(
                f"{name} {run}: {dt:.1f} s — {n} rows "
                f"({dt / n_docs * 1e6:.1f} us/doc)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
