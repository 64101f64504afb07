#!/usr/bin/env python
"""BM25 idf-floor pruning measurement on a ZIPF-realistic corpus.

The round-6 WAND/pruning evaluation declined pruning on the uniform-
vocab rehearsal — a worst case where every posting list is the same
length and pruning provably cannot help. Real corpora are Zipf: a few
head terms own most of the scored mass while carrying near-zero idf
weight. This rehearsal builds a deterministic Zipf(s≈1) corpus (rank
r = floor(V^u) for u uniform from xxhash64 — P(rank ≤ r) = log_V r,
i.e. p(r) ∝ 1/r), then measures, at each corpus size:

  * exact `bm25_rankings` wall time (the hash-verified plan);
  * pruned wall time at max_df_ratio ∈ {0.01, 0.001} (drop query
    terms whose df exceeds that corpus fraction before the probe);
  * the candidate (scored-pair) mass each variant touches;
  * top-k recall of the pruned ranking vs the exact one (approximation
    cost — pruning changes scores, which is why it is opt-in).

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_bm25_zipf.py [n_docs] [cpus]
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

    from maillog2db_spark.operators import text as tx
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_bm25_zipf", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, n_docs // 15_000))
    )

    vocab = 50_000
    base = spark.range(0, n_docs, 1, p)
    # u uniform in [0,1) from xxhash64; rank = floor(V^u) ∈ [1, V)
    u = (
        "pmod(xxhash64(concat(cast(id as string), '_', cast(i as string))),"
        " 1000000) / 1000000.0"
    )
    tok = f"concat('w', cast(pow({float(vocab)}, {u}) as bigint))"
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("s0").alias("source"),
        F.expr(
            "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))

    d = tempfile.mkdtemp(prefix="bm25_zipf_")
    docs.write.parquet(f"{d}/documents.parquet")
    print(f"zipf corpus: {n_docs} docs, V={vocab} at {d}", flush=True)

    def run(tag: str, ratio: float | None):
        df = tx.bm25_rankings(spark, d, tx.BM25_N_QUERIES, tx.BM25_TOP_K,
                              max_df_ratio=ratio)
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        print(f"{tag}: {dt:.1f} s ({n} rows)", flush=True)
        return dt, df

    # warm scans once so exact-vs-pruned is not a page-cache comparison
    run("warmup (exact)", None)
    t_exact, exact_df = run("exact", None)
    exact = {
        (r.query_id, r.doc_id)
        for r in exact_df.select("query_id", "doc_id").collect()
    }
    for ratio in (0.01, 0.001):
        t_pruned, pruned_df = run(f"pruned max_df_ratio={ratio}", ratio)
        got = {
            (r.query_id, r.doc_id)
            for r in pruned_df.select("query_id", "doc_id").collect()
        }
        recall = len(got & exact) / max(len(exact), 1)
        print(
            f"  speedup {t_exact / max(t_pruned, 1e-9):.2f}x, "
            f"top-{tx.BM25_TOP_K} recall vs exact {recall:.3f}",
            flush=True,
        )

    # candidate-mass accounting: posting rows the probe touches
    toks = (
        spark.read.parquet(f"{d}/documents.parquet")
        .select("doc_id", F.explode(F.expr(tx._TOKENS_SPARK)).alias("term"))
    )
    corpus = toks.filter(F.col("doc_id") >= tx.BM25_N_QUERIES)
    qt = (
        toks.filter(F.col("doc_id") < tx.BM25_N_QUERIES)
        .select("term").distinct()
    )
    ctf = corpus.groupBy("doc_id", "term").count()
    dfreq = ctf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = n_docs - tx.BM25_N_QUERIES
    for tag, cond in [
        ("exact", F.lit(True)),
        ("ratio=0.01", F.col("df") <= 0.01 * nd),
        ("ratio=0.001", F.col("df") <= 0.001 * nd),
    ]:
        mass = (
            ctf.join(F.broadcast(qt), "term")
            .join(F.broadcast(dfreq.filter(cond)), "term", "left_semi")
            .count()
        )
        print(f"candidate mass {tag}: {mass}", flush=True)

    spark.stop()
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
