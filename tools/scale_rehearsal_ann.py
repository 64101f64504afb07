#!/usr/bin/env python
"""ANN/semantic-dedup scale rehearsal beyond the driver's SFs.

Generates a deterministic synthetic embedding corpus (xxhash64-mixed
uniform [-1,1] floats — centered, so hyperplane buckets fill evenly;
2% planted exact-duplicate mass) and times the embedding family:
quantizer build, semantic_dedup decisions, IVF top-k probe.

The lever this rehearsal exercises is BLOCK COUNT ∝ CORPUS: the
registered queries fix N_PLANES=8 (256 buckets — correct at driver
SFs, and required for oracle parity), but per-block occupancy n/(cells
× 2^planes) is what bounds the pairwise verify, so at 10× the vectors
you add ~3 planes. The tool sets similarity.N_PLANES for the run
(everything downstream reads it at call time); planted-dup recall is
asserted — exact duplicates collide in every blocking key regardless
of plane count, so the decisions must drop exactly the planted mass.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_ann.py [n_vecs] [cpus] [n_planes]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # default: keep expected block occupancy ≈ the 200k/8-plane baseline
    n_planes = (
        int(sys.argv[3])
        if len(sys.argv) > 3
        else max(8, 8 + math.ceil(math.log2(n_vecs / 200_000)) if n_vecs > 200_000 else 8)
    )

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.operators import similarity
    from maillog2db_spark.session import get_spark

    similarity.N_PLANES = n_planes

    spark = get_spark("scale_rehearsal_ann", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, n_vecs // 15_000)))

    d = tempfile.mkdtemp(prefix="ann_rehearsal_")
    # deterministic centered vectors; id % 50 == 49 duplicates id-1
    src_id = "cast(CASE WHEN id % 50 = 49 THEN id - 1 ELSE id END AS string)"
    vec = (
        "transform(sequence(0, 63), i -> cast("
        f"cast(pmod(xxhash64(concat({src_id}, '_', cast(i AS string))), 2000001) AS double)"
        " / 1000000.0 - 1.0 AS float))"
    )
    (
        spark.range(0, n_vecs, 1, p)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(vec).alias("embedding"),
            (F.col("id") % 10).cast("int").alias("label"),
        )
        .write.parquet(f"{d}/embeddings.parquet")
    )
    print(f"corpus: {n_vecs} vectors, {n_planes} planes "
          f"({10 * 2**n_planes} blocks)", flush=True)

    timings: dict[str, float] = {}

    def stage(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        timings[name] = dt
        print(f"{name}: {dt:.1f} s — {out}", flush=True)

    stage(
        "quantizer(centroids+thresholds)",
        lambda: f"{similarity.centroids_with_norms(spark, d).count()} cells, "
        f"{len(similarity._plane_thresholds(spark, d))} thresholds",
    )

    decisions = similarity.semantic_dedup(spark, d).persist()
    n_dropped = None

    def _dec():
        nonlocal n_dropped
        total = decisions.count()
        n_dropped = decisions.filter(~F.col("kept")).count()
        return f"{total} decisions, {n_dropped} dropped"

    stage("semantic_dedup", _dec)
    planted = n_vecs // 50
    assert n_dropped is not None and n_dropped >= planted, (
        f"planted {planted} exact dups must all be dropped, got {n_dropped}"
    )
    print(f"planted-dup recall ok: {n_dropped} dropped >= {planted} planted", flush=True)

    stage(
        "ann_ivf_topk",
        lambda: f"{similarity.ann_ivf_topk(spark, d).count()} result rows",
    )

    # Lloyd's trainer over the same corpus: cost must be ~2 linear
    # assignment scans (broadcast centroids) + k×dim aggregates —
    # the per-vector rate should track the dedup stage, not exceed it
    stage(
        "kmeans(2 iter)",
        lambda: f"{similarity.kmeans(spark, d).count()} clusters",
    )

    # PQ: encode must be ~one assignment scan (cheaper than kmeans —
    # subspace distances are 8-dim); ADC search cost is corpus-linear
    # in CODE rows, independent of vector dimensionality
    stage(
        "pq_encode",
        lambda: f"{similarity.pq_encode(spark, d).count()} code words",
    )
    stage(
        "pq_adc_topk",
        lambda: f"{similarity.pq_adc_topk(spark, d).count()} result rows",
    )

    # IVFADC composition: coarse cells prune the candidate set BEFORE
    # the ADC lookups, so this stage should undercut pq_adc_topk (which
    # scans every code) — the gap is the prune factor cells/N_PROBE
    stage(
        "ivfpq_adc_topk(build+query)",
        lambda: f"{similarity.ivfpq_adc_topk(spark, d).count()} result rows",
    )
    # the deployment shape: index built once (cached above), every
    # further query pays only LUT build + the cell-pruned scoring join
    stage(
        "ivfpq_adc_topk(warm probe)",
        lambda: f"{similarity.ivfpq_adc_topk(spark, d).count()} result rows",
    )

    total = sum(timings.values())
    print(
        f"total {total:.1f} s = {1e6 * total / n_vecs:.0f} us/vector "
        f"(vectors={n_vecs}, planes={n_planes}, cpus={cpus})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
