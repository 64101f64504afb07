#!/usr/bin/env python
"""Dedup-stack scale rehearsal beyond the driver's SFs.

Generates a deterministic synthetic corpus (fixed vocab, planted exact
dups and near-dups — same protocol as the round-3 one-off recorded in
SCALING.md) and times each stage of the near-dup stack. Run at
500k docs to compare builds, and at 2–5M to probe another decade.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    # 24g heap for the multi-million-doc runs (the session default 8g
    # OOMed the 2M signature aggregate before partition sizing)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.session import get_spark
    from maillog2db_spark.operators import dedup

    spark = get_spark("scale_rehearsal", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    # THE scale lever this rehearsal exists to exercise: the signature
    # build explodes ~58 shingle rows per doc into a hash aggregate, so
    # shuffle partitions must track corpus volume for a partition to fit
    # executor memory (at 2M docs / 116M shingle rows, 32 partitions =
    # 3.6M wide-keyed rows per hash map → UNABLE_TO_ACQUIRE_MEMORY;
    # ~15k docs per partition keeps maps ~50 MB). AQE coalesces the
    # small stages back down, so oversizing costs nothing.
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, n_docs // 15_000))
    )

    # deterministic corpus: 60-token docs over a 5k-word vocab (xxhash64
    # mixing — no RNG), 1% exact-dup mass, 0.5% planted near-dup pairs
    # (J≈0.95: one token substituted)
    base = spark.range(0, n_docs, 1, p)
    tok = (
        "concat('w', pmod(xxhash64(concat(cast(id as string), '_', "
        "cast(i as string))), 5000))"
    )
    # branch order matters: ids ≡ 199 (mod 200) are exact dups of the
    # PREVIOUS doc, and that previous doc (≡ 198) carries the
    # SUBSTITUTED near-dup text — so the copy must reproduce the
    # substituted recipe, not the plain formula of id-1 (the original
    # version did the latter, silently halving the planted exact-dup
    # mass; caught in round-4 review)
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.when(
            F.expr("id % 200 = 199"),  # exact dup of a near-dup doc
            F.expr(
                "array_join(transform(sequence(0, 59), i -> CASE WHEN i = 30 "
                "THEN 'subst' ELSE "
                + tok.replace("cast(id as string)", "cast(id - 198 as string)")
                + " END), ' ')"
            ),
        )
        .when(
            F.expr("id % 100 = 99"),  # exact dup of the previous doc
            F.expr(
                "array_join(transform(sequence(0, 59), i -> "
                + tok.replace("cast(id as string)", "cast(id - 1 as string)")
                + "), ' ')"
            ),
        )
        .when(
            F.expr("id % 200 = 198"),  # near-dup: one token substituted
            F.expr(
                "array_join(transform(sequence(0, 59), i -> CASE WHEN i = 30 "
                "THEN 'subst' ELSE "
                + tok.replace("cast(id as string)", "cast(id - 197 as string)")
                + " END), ' ')"
            ),
        )
        .otherwise(
            F.expr("array_join(transform(sequence(0, 59), i -> " + tok + "), ' ')")
        )
        .alias("text"),
    ).persist()
    n = docs.count()
    print(f"corpus: {n} docs", flush=True)

    timings: dict[str, float] = {}

    def stage(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        timings[name] = dt
        print(f"{name}: {dt:.1f} s — {out}", flush=True)

    rep = dedup.rep_base_from_docs(docs, p).persist()
    stage("exact_dedup(rep collapse)", lambda: f"{rep.count()} groups")

    sigs = dedup.minhash_from_rep_base(rep).persist()
    stage("minhash_signatures", lambda: f"{sigs.count()} sigs")

    cand = dedup._band_pairs(sigs).persist()
    stage("lsh_candidate_pairs", lambda: f"{cand.count()} candidates")

    sh = rep.select(F.col("doc_id").alias("_id"), F.col("sh").alias("_sh"))
    j, ppm = dedup.jaccard_ppm(F.col("a_sh"), F.col("b_sh"))
    verified = (
        cand.join(sh, cand.doc_a == sh._id)
        .select("doc_a", "doc_b", F.col("_sh").alias("a_sh"))
        .join(sh, F.col("doc_b") == sh._id)
        .select("doc_a", "doc_b", "a_sh", F.col("_sh").alias("b_sh"))
        .withColumn("_j", j)
        .filter(F.col("_j") >= dedup.JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", ppm.alias("jaccard_ppm"))
        .persist()
    )
    stage("neardup_verify", lambda: f"{verified.count()} verified")

    # PassJoin edit-distance pass on the SAME corpus: this corpus is the
    # length-band worst case (uniform 60-token docs — one giant band), the
    # shape that sent the banded v1 quadratic; segment-content blocking
    # must stay corpus-linear here
    import tempfile

    ed_dir = tempfile.mkdtemp(prefix="ed_rehearsal_")
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s0")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        f"{ed_dir}/documents.parquet"
    )
    stage(
        "edit_distance_pairs(PassJoin)",
        lambda: f"{dedup.edit_distance_pairs(spark, ed_dir).count()} pairs",
    )

    total = sum(timings.values())
    print(
        f"total {total:.1f} s = {1e6 * total / n:.0f} us/doc "
        f"(docs={n}, cpus={cpus})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
