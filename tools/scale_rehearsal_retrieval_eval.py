#!/usr/bin/env python
"""Streaming retrieval-quality monitor rehearsal: per-batch cost vs
accumulated corpus.

The stores under test (streaming_retrieval_eval.DenseTopKStore +
streaming_bm25.PostingsStore) claim per-batch ingest cost proportional
to BATCH size (dense: batch × n_queries scoring + a bounded ≤
k-rows/query top-k merge; lexical: one tf aggregate + a batch-grain
partition write) — NEVER to the accumulated corpus. This rehearsal
feeds constant-size corpus waves until the accumulated corpus crosses
a decade (250k → 2M vectors/docs) and records each wave's ingest wall
time: flat per-wave cost = the contract holds; a rising tail = state
leaked into the per-batch path (the BM25 dl-join failure class).

The resolved view (``retrieval_eval`` — the batch-equivalent grid) is
measured once per decade for reference; ITS cost tracks the corpus by
design (it re-reads accumulated postings), which is why monitoring
rides the incremental stores instead.

Deterministic synthetics, no RNG: embeddings are 16-dim xxhash64
unit-grid vectors; documents are the 60-token 5k-vocab protocol shared
with the other rehearsals.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_retrieval_eval.py \
        [n_total] [wave_size] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark import streaming_bm25 as sb
    from maillog2db_spark import streaming_retrieval_eval as sre
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_retrieval_eval", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, wave // 15_000))
    )

    dim = 16

    def emb_range(lo: int, hi: int):
        comp = (
            "transform(sequence(0, {d}), j -> CAST(pmod(xxhash64(concat("
            "cast(id as string), '_', cast(j as string))), 1000) AS FLOAT)"
            " / 1000.0)"
        ).format(d=dim - 1)
        return spark.range(lo, hi, 1, p).select(
            F.col("id").alias("vec_id"),
            F.expr(comp).alias("embedding"),
            F.expr("CAST(pmod(id, 7) AS INT)").alias("label"),
        )

    def docs_range(lo: int, hi: int):
        tok = (
            "concat('w', pmod(xxhash64(concat(cast(id as string), '_', "
            "cast(i as string))), 5000))"
        )
        return spark.range(lo, hi, 1, p).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("s0").alias("source"),
        ).withColumn("n_chars", F.length("text"))

    root = tempfile.mkdtemp(prefix="retr_eval_rehearsal_")
    dense = sre.DenseTopKStore(os.path.join(root, "dense"))
    postings = sb.PostingsStore(os.path.join(root, "postings"))

    dense.register_queries(emb_range(0, sre.HYBRID_N_QUERIES))
    # query docs land in batch 0 alongside the first corpus slice
    sb.bm25_ingest_batch(spark, docs_range(0, sre.HYBRID_N_QUERIES), postings, 9999)

    n_waves = n_total // wave
    print(
        f"{n_waves} waves x {wave} rows -> {n_total} accumulated "
        f"({dim}-dim dense, 60-tok lexical)",
        flush=True,
    )
    for i in range(n_waves):
        lo = sre.HYBRID_N_QUERIES + i * wave
        hi = sre.HYBRID_N_QUERIES + (i + 1) * wave
        t0 = time.time()
        sre.dense_ingest_batch(spark, emb_range(lo, hi), dense, i)
        t_dense = time.time() - t0
        t0 = time.time()
        sb.bm25_ingest_batch(spark, docs_range(lo, hi), postings, i)
        t_lex = time.time() - t0
        print(
            f"wave {i}: dense {t_dense:.1f} s, lexical {t_lex:.1f} s "
            f"(corpus {hi} rows)",
            flush=True,
        )

    t0 = time.time()
    n = sre.retrieval_eval(spark, postings, dense).count()
    print(
        f"resolved eval grid at {n_total}: {time.time() - t0:.1f} s "
        f"({n} rows) — corpus-tracking by design",
        flush=True,
    )

    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
