#!/usr/bin/env python
"""Perceptual streaming stores rehearsal: per-wave ingest cost as the
accumulated index grows (pHash banded store + keyed-fingerprint store).

Cost model under test — and unlike the additive stores, these probes
are NOT corpus-independent by design: each wave's near-dup probe must
check new items against ALL accumulated signatures/keys, so per-wave
cost = O(batch work) + O(one scan of the accumulated index restricted
to the probe's blocking buckets). The claims that must hold:

  1. growth is LINEAR in the accumulated index (one scan), never
     super-linear (no pairwise blow-up: the banded/bucketed equi-join
     keeps candidates sparse);
  2. the constant is a SCAN constant — the store side never shuffles
     (the batch side broadcasts onto it / shuffles to its layout);
  3. batch-local work (signature hashing) stays flat per wave.

At 100 TB this is the standard 'dedup today's drop against all
history' shape: cost per day grows with history, amortized by batch
sizing, bounded per-probe by bucket pruning (match_keys measures the
serving side separately).

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_fingerprint.py \
        [n_docs] [wave] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark import streaming_fingerprint as skf
    from maillog2db_spark import streaming_phash as sph
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_fingerprint", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

    def docs_range(lo: int, hi: int):
        return spark.range(lo, hi, 1, p).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("synthetic doc "), F.col("id").cast("string"))
            .alias("text"),
            F.lit("en").alias("lang"),
            F.lit("s0").alias("source"),
            F.lit(20).alias("n_chars"),
        )

    root = tempfile.mkdtemp(prefix="fp_rehearsal_")
    ph = sph.PhashStore(os.path.join(root, "phash"))
    au = skf.KeyedFingerprintStore(os.path.join(root, "audio"), min_shared=2)

    n_waves = n_docs // wave
    print(f"{n_waves} waves x {wave} docs -> {n_docs} accumulated", flush=True)
    for i in range(n_waves):
        lo, hi = i * wave, (i + 1) * wave
        t0 = time.time()
        sph.phash_ingest_batch(spark, docs_range(lo, hi), ph, i)
        t_ph = time.time() - t0
        t0 = time.time()
        skf.audio_ingest_batch(spark, docs_range(lo, hi), au, i)
        t_au = time.time() - t0
        print(
            f"wave {i}: phash {t_ph:.1f} s, audio-keys {t_au:.1f} s "
            f"(index {hi} docs = {2 * hi} items)",
            flush=True,
        )

    # serving-side: match one clip's keys against the full index —
    # must stay flat regardless of index size (bucket pruning)
    from maillog2db_spark.operators.multimodal import (
        audio_fingerprint_of,
        audio_segment_keys,
    )

    one = audio_segment_keys(audio_fingerprint_of(docs_range(0, 1)))
    fkeys = [r.fkey for r in one.collect()]
    t0 = time.time()
    n = skf.match_keys(spark, au, fkeys).count()
    print(
        f"match_keys over {2 * n_docs}-item index: "
        f"{time.time() - t0:.2f} s ({n} matches)",
        flush=True,
    )

    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
