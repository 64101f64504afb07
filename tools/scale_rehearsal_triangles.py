#!/usr/bin/env python
"""Incremental-triangle-store rehearsal beyond the gate SFs.

Deterministic synthetic baskets, no RNG: n_orders orders of 6 parts
each, part ids drawn by xxhash64 from a pool of n_orders//20 parts —
dense enough that pair supports keep crossing BASKET_MIN_SUPPORT in
every wave, which is the worst case for the incremental path (every
wave pays a real threshold-crossing probe, not a no-op).

Claims under test:
  * per-wave ingest cost tracks the WAVE (batch pair deltas + the
    D-probe at affected-edge grain), not the accumulated corpus — a
    growing per-wave cost would mean a corpus-grain rescan leaked in;
  * the resolved stats after all waves equal a from-scratch batch
    enumeration of the full graph EXACTLY (asserted, not sampled).

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_triangles.py [n_orders] [cpus] [waves]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_waves = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark import streaming_triangles as st
    from maillog2db_spark.operators.corpus_analytics import (
        BASKET_MIN_SUPPORT,
        triangle_stats_from,
    )
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_triangles", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, n_orders // 20_000))
    )

    pool = max(100, n_orders // 20)
    li = (
        spark.range(0, n_orders, 1, p)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(F.expr(
                "transform(sequence(0, 5), i -> "
                f"pmod(xxhash64(concat(cast(id as string), '_', cast(i as string))), {pool}))"
            )).alias("l_partkey"),
        )
        .localCheckpoint(eager=True)
    )
    print(f"orders: {n_orders}, pool: {pool}, lineitem rows: {li.count()}",
          flush=True)

    store = st.TriangleStore(tempfile.mkdtemp(prefix="tri_rehearsal_"))
    for i in range(n_waves):
        w = li.filter(F.pmod(F.col("l_orderkey"), F.lit(n_waves)) == i)
        t0 = time.time()
        st.triangles_ingest_batch(spark, w, store, i)
        print(f"ingest wave {i}: {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    got = st.copurchase_triangles(spark, store)
    n_got = got.count()
    print(f"resolve: {time.time() - t0:.1f} s, {n_got} parts", flush=True)

    # from-scratch batch twin on the full graph — exact equality
    t0 = time.time()
    edges = (
        st._batch_pairs(li)
        .filter(F.col("w") >= BASKET_MIN_SUPPORT)
        .select("pa", "pb")
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(e3, (F.col("e3.pa") == F.col("e1.pa"))
              & (F.col("e3.pb") == F.col("e2.pb")))
        .select(F.col("e1.pa").alias("a"), F.col("e1.pb").alias("b"),
                F.col("e2.pb").alias("c"))
    )
    per_part = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    want = triangle_stats_from(edges, per_part)
    diff = got.exceptAll(want).unionAll(want.exceptAll(got)).count()
    print(f"batch twin: {time.time() - t0:.1f} s; row diff: {diff}", flush=True)
    assert diff == 0, "incremental != batch"
    tot_tri = got.agg(F.sum("n_triangles")).collect()[0][0]
    print(f"OK — total corner-attributed triangles: {tot_tri}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
