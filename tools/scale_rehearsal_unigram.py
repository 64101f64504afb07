#!/usr/bin/env python
"""Unigram-tokenizer trainer rehearsal beyond the driver's SFs.

Same deterministic corpus protocol as scale_rehearsal_bm25/dsir
(60-token docs over a 5k-word xxhash64 vocab, no RNG). The trainer's
cost model under test: the corpus is touched ONCE (word counts); the
seed explode, both EM E-steps (per-word piece-map build + the
two-expression DP), and the re-estimations are all WORD-VOCAB-grain —
fixed at 5k words here — so total wall time must go corpus-linear
with a flat vocab-side tail, and µs/doc must FALL as the word-count
scan amortizes the fixed EM cost. A rising per-doc cost would mean
corpus-grain work leaked into the EM loop.

The VOCAB decade (round 6): pass a third argument to scale the WORD
VOCAB while n_docs stays fixed — corpus-side work constant, vocab-side
work scales, which isolates exactly the claim. Per-EM-iteration wall
time is recorded via the trainer's stats hook (each round is forced by
the smoothing-scalar collect, so the split is real work).

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_unigram.py [n_docs] [cpus] [vocab]
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
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.operators import text as tx
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_unigram", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    # partition width must track BOTH volume drivers: the corpus scan
    # (rows ∝ n_docs) and the vocab-side DP probe mass (rows ∝ word
    # types × positions × piece lengths — ~33 rows/type at 8-char
    # words); sizing by n_docs alone starved the 2M-type decade into
    # oversized, spilling partitions
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(cpus, n_docs // 15_000, vocab // 30_000)),
    )

    base = spark.range(0, n_docs, 1, p)
    tok = (
        "concat('w', pmod(xxhash64(concat(cast(id as string), '_', "
        f"cast(i as string))), {vocab}))"
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("s1").alias("source"),
        F.expr(
            "array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')"
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))

    d = tempfile.mkdtemp(prefix="unigram_rehearsal_")
    docs.write.parquet(f"{d}/documents.parquet")
    print(f"corpus: {n_docs} docs at {d}", flush=True)

    # warm the session state through the stats hook so the EM rounds
    # are individually timed, then run the registered query (cache hit)
    stats: dict = {}
    t0 = time.time()
    tx._uni_state(spark, d, stats=stats)
    rows = tx.unigram_tokenizer(spark, d).collect()
    dt = time.time() - t0
    assert len(rows) == tx.UNI_TOP, len(rows)
    # semantic sanity: every piece count is positive and the shares
    # are a valid ppm distribution head
    assert all(r.cnt > 0 and 0 < r.share_ppm <= 1_000_000 for r in rows)
    print(
        f"unigram_tokenizer: {dt:.1f} s for {n_docs} docs, vocab {vocab} "
        f"({dt / n_docs * 1e6:.1f} us/doc); per-EM-iteration "
        f"{stats.get('iter_sec')}; top piece "
        f"{rows[0].piece!r} cnt={rows[0].cnt}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
