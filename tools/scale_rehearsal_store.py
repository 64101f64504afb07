#!/usr/bin/env python
"""Additive-store fan-out vs compaction: measured, not argued.

The streaming stores (postings / monthly / vocab / drift) persist one
partition per micro-batch; every read-time resolution re-aggregates
across partitions, so resolution cost grows with BATCH COUNT even when
the resolved state is small. ``ledger.compact_additive_store`` folds
committed partials into one partition; this rehearsal measures the
read path on the postings store before and after, at a batch fan-out
high enough for the per-partition overhead (file listing, footer
reads, task scheduling) to dominate.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_store.py [n_batches] [docs_per_batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from pyspark.sql import functions as F

    from maillog2db_spark import streaming_bm25 as sb
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_store", cpus=8)
    store = sb.PostingsStore(tempfile.mkdtemp(prefix="store_rehearsal_"))

    tok = (
        "concat('w', pmod(xxhash64(concat(cast(id as string), '_', "
        "cast(i as string))), 5000))"
    )
    t0 = time.time()
    for b in range(n_batches):
        docs = spark.range(
            b * per_batch, (b + 1) * per_batch, 1, 4
        ).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
            ).alias("text"),
        )
        sb.bm25_ingest_batch(spark, docs, store, b)
    t_ingest = time.time() - t0
    print(
        f"ingested {n_batches} batches x {per_batch} docs "
        f"({t_ingest / n_batches:.2f} s/batch)",
        flush=True,
    )

    def resolve():
        t0 = time.time()
        n = store.postings(spark).count()
        return time.time() - t0, n

    t_before, n_before = resolve()
    t_before2, _ = resolve()
    print(
        f"resolution over {n_batches} partitions: {t_before:.1f} s cold, "
        f"{t_before2:.1f} s warm ({n_before} postings)",
        flush=True,
    )

    t0 = time.time()
    sb.compact_postings(spark, store)
    t_compact = time.time() - t0
    t_after, n_after = resolve()
    t_after2, _ = resolve()
    assert n_after == n_before, (n_before, n_after)
    print(
        f"compaction {t_compact:.1f} s; resolution over 1 partition: "
        f"{t_after:.1f} s cold, {t_after2:.1f} s warm — postings identical",
        flush=True,
    )

    # serving path: a short (realistic) query prunes to its terms'
    # buckets; compare against a full-resolution rescore of the same
    # query (the pre-round-5 serving shape)
    from pyspark.sql import functions as F2
    from maillog2db_spark.operators.text import (
        BM25_N_QUERIES, bm25_from_tf,
    )

    q = "w17 w401 w2203"
    t0 = time.time()
    pruned = sb.search(spark, store, q, k=5).collect()
    t_pruned = time.time() - t0
    t0 = time.time()
    tf = store.postings(spark)
    ctf = tf.filter(F2.col("doc_id") >= BM25_N_QUERIES)
    qt = (
        spark.createDataFrame([(q,)], "text string")
        .select(F2.explode(F2.expr(sb._TOKENS_SPARK)).alias("term"))
        .distinct()
        .select(F2.lit(-1).cast("bigint").alias("query_id"), "term")
    )
    full = [
        (r.doc_id, r.bm25_ppm, r.rank)
        for r in bm25_from_tf(ctf, qt).collect()
        if r.rank <= 5
    ]
    t_full = time.time() - t0
    assert sorted(full) == sorted((r.doc_id, r.bm25_ppm, r.rank) for r in pruned)
    print(
        f"3-term search: pruned {t_pruned:.1f} s vs full-resolution "
        f"{t_full:.1f} s — results identical",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
