#!/usr/bin/env python
"""Greedy k-center coreset at 250k-2M vectors: per-step cost decade.

The operator's scale claim (operators/selection.py): per greedy step,
ONE narrow map over the persisted state (least(mind, dissim) — exactly
one literal-center dot product per row) + ONE TakeOrdered(1); no
joins, no shuffles; at most TWO corpus-resident state copies (persist
new / unpersist one-step-older). Per-step cost must be LINEAR in
corpus size and FLAT across steps. This rehearsal measures both axes
on a deterministic synthetic corpus (the ANN rehearsal's
xxhash64-mixed unit-cube vectors, dim 64) — and it is the measurement
that CHOSE the formulation:

  * v1 (per-step localCheckpoint, no unpersist): 2.2x superlinear
    per-step cost at 2M vectors — K accumulated corpus-sized
    checkpoint copies outgrew memory;
  * v2 (stateless recount, least over s literal-center dissims per
    scan): 5x superlinear — K^2*N/2 interpreted HOF dissim
    evaluations dominate once N is real, and duplicated 64-literal
    trees also made Catalyst analysis the bottleneck at small N;
  * v3 (r7-r10: incremental min column, persist/unpersist pairing)
    is the K*N form with bounded residency;
  * v4 (shipped, r11: lazy-greedy buffer — one TakeOrdered(J) fill,
    driver-certified steps, vectorized pandas-UDF scorer) keeps v3's
    K*N work bound but cuts the job count from K+2 to 3+refills;
    certified steps are bit-equal by construction (selection.py).
    Measured at 2M vectors: total 38 s with 2-3 refill jobs/run,
    per-step s/1M flat across the 250k->2M decade.

Measured axes: per-step wall across the 8 steps at each size (flat),
mean per-step across 250k -> 2M (~linear in N), and the assignment
census (in-row array_min over the literal center-struct array +
K-group count — stateless, shuffle-free) separately.

Also asserts the trajectory invariants at every size (radius
non-increasing, census covers the corpus) so the measurement can't
pass on a silently-wrong operator.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_kcenter.py [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, n_vecs: int, parallelism: int):
    from pyspark.sql import functions as F

    vec = (
        "transform(sequence(0, 63), i -> cast("
        "cast(pmod(xxhash64(concat(cast(id AS string), '_', cast(i AS string))), 2000001) AS double)"
        " / 1000000.0 - 1.0 AS float))"
    )
    return spark.range(0, n_vecs, 1, parallelism).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 8)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.operators.selection import kcenter_from
    from maillog2db_spark.operators.similarity import _norm
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_kcenter", cpus=cpus)
    p = spark.sparkContext.defaultParallelism

    K = 8
    results = []
    for n in (250_000, 500_000, 1_000_000, 2_000_000):
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(cpus, n // 60_000))
        )
        e = corpus(spark, n, p).select(
            "vec_id",
            F.col("embedding").alias("emb"),
            _norm(F.col("embedding")).alias("nrm"),
        )  # kcenter_from materializes the base once itself
        stats: list = []
        t0 = time.time()
        out = kcenter_from(e, K, stats=stats)
        rows = sorted(out.collect(), key=lambda r: r.step)
        census_s = time.time() - t0 - sum(s for _, s in stats)
        total_s = time.time() - t0

        radii = [r.radius_ppm for r in rows][1:]
        assert all(a >= b for a, b in zip(radii, radii[1:])), radii
        assert sum(r.n_assigned for r in rows) == n
        per_step = [s for _, s in stats]
        mean_step = sum(per_step) / len(per_step)
        results.append((n, mean_step, census_s, total_s))
        print(
            f"n={n:>9,}  per-step s: "
            + " ".join(f"{s:.2f}" for s in per_step)
            + f"  mean={mean_step:.2f}  census={census_s:.2f}"
            f"  total={total_s:.1f}",
            flush=True,
        )

    print("\nn_vecs, mean_step_s, census_s, total_s, step_s_per_1M")
    for n, ms, cs, ts in results:
        print(f"{n}, {ms:.2f}, {cs:.2f}, {ts:.1f}, {ms * 1e6 / n:.2f}")
    # linear-in-N check: per-step cost per vector must not GROW across
    # the decade (flat or falling = linear or better)
    unit = [ms * 1e6 / n for n, ms, _, _ in results]
    print(
        "per-step s/1M-vectors across decade:",
        " ".join(f"{u:.2f}" for u in unit),
        flush=True,
    )


if __name__ == "__main__":
    main()
