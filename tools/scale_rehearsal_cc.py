#!/usr/bin/env python
"""Star-contraction connected-components rehearsal beyond oracle SF.

Deterministic synthetic graph, no RNG: n_nodes nodes in n_comps
planted components. Each component c owns the contiguous id block
[c·B, (c+1)·B); inside a block the edges form a CHAIN (the worst
topology for min-label propagation — diameter = B) plus one long-range
chord per 16 nodes (keeps it from being a pure path). The planted
answer is exact: every node's component label must be its block's
minimum id, and the ROUND count — not just wall time — is the claim
under test: O(log B) contractions where propagation would take O(B).

What a super-linear decade would mean: the per-round edge set stopped
shrinking (large-star fanout pathology) or the convergence probe
started scanning more than the edge list.

Second phase (round 6): the STREAMING merge cost on the same graph —
the edges split into hash-mixed waves (every wave carries edges from
every block, so later waves force heavy cross-component merges), each
wave folded through streaming_cc.cc_ingest_batch with per-batch wall
time and merge-contraction round counts recorded, and the final
resolved labels verified against the planted answer. The claim under
test: per-batch cost is batch + merged-members grain, and the merge
contraction runs on the CONTRACTED (component-id) graph, so its round
count stays small even when the underlying blocks are
million-node-diameter chains.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_cc.py [n_nodes] [cpus] [block] [waves]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import functions as F

    from maillog2db_spark.operators.graph import star_components
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_cc", cpus=cpus)
    p = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(cpus, n_nodes // 500_000 * cpus))
    )

    ids = spark.range(0, n_nodes, 1, p)
    chain = ids.filter(
        (F.col("id") + 1) % block != 0  # no edge across block boundary
    ).filter(F.col("id") + 1 < n_nodes).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # one chord per 16 nodes: id -> block_start + ((id*2654435761) mod block)
    chord = ids.filter(F.col("id") % 16 == 0).select(
        F.col("id").alias("src"),
        (
            (F.col("id") - F.col("id") % block)
            + F.pmod(F.col("id") * F.lit(2654435761), F.lit(block))
        ).alias("dst"),
    ).filter(F.col("dst") < n_nodes)
    edges = chain.unionAll(chord)

    t0 = time.time()
    stats: dict = {}
    labels = star_components(edges, stats=stats)
    # verify the planted answer EXACTLY: label == block minimum
    bad = labels.filter(
        F.col("comp") != F.col("node") - F.pmod(F.col("node"), F.lit(block))
    ).count()
    n = labels.count()
    dt = time.time() - t0
    assert bad == 0, f"{bad} mislabeled nodes"
    print(
        f"star_components: {dt:.1f} s for {n_nodes} nodes "
        f"({n} labeled, block diameter {block}) in {stats['rounds']} rounds "
        f"({dt / n_nodes * 1e6:.1f} us/node)",
        flush=True,
    )

    # ---- streaming merge phase: hash-mixed waves, heavy cross-merges
    import tempfile

    from maillog2db_spark.streaming_cc import CCStore, cc_ingest_batch

    n_waves = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    store = CCStore(tempfile.mkdtemp(prefix="cc_rehearsal_store_"))
    edges = edges.localCheckpoint(eager=True)
    for i in range(n_waves):
        w = edges.filter(
            F.pmod(F.xxhash64("src", "dst"), F.lit(n_waves)) == i
        )
        t0 = time.time()
        bstats: dict = {}
        cc_ingest_batch(spark, w, store, i, stats=bstats)
        dt = time.time() - t0
        print(
            f"cc_ingest_batch {i}: {dt:.1f} s, merge contraction "
            f"{bstats.get('rounds', 0)} rounds",
            flush=True,
        )
    t0 = time.time()
    resolved = store.current_labels(spark)
    bad = resolved.filter(
        F.col("comp") != F.col("node") - F.pmod(F.col("node"), F.lit(block))
    ).count()
    n = resolved.count()
    dt = time.time() - t0
    assert bad == 0, f"{bad} mislabeled streaming nodes"
    print(
        f"streaming resolve: {dt:.1f} s, {n} nodes verified == planted",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
