#!/usr/bin/env python
"""K-core round-budget study: adversarial peel depth vs the 64-round cap.

The engine's ``graph.kcore`` peels to the runtime fixpoint and RAISES
past KCORE_MAX_ROUNDS=64 — correct-loud, but round 6 asked: would a
different formulation (h-index iteration, Lü et al. 2016 "H-operator";
bucket peeling) bound rounds by core value instead of cascade depth?

This rehearsal answers with a constructed worst case, the CASCADE
LADDER: rail nodes r_0..r_D form a circulant C(D,{1,2}) (degree 4 —
core-safe at k=3 forever); ladder nodes u_0..u_D each connect to
u_{i-1}, u_{i+1}, r_i (degree exactly 3); u_0 starts at degree 2. Each
round removes exactly one u_i — peel depth is D by construction, and
u_D's non-coreness depends on u_0's degree D hops away, so in the
LOCAL model ANY algorithm whose per-round information flow follows
edges (peeling, h-index, bucket variants) needs ≥ D rounds. The
h-index iteration is implemented below and measured to confirm it
propagates the same one-hop-per-round front (plus it computes full
coreness, which the fixed-k operator doesn't need).

Output feeds the SCALING.md round-budget justification: measured round
counts on realistic graphs (co-purchase pair graphs: 0-10) vs ladders
(exactly D), the h-index round equality, and the budget-raise at
D > 64.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_kcore.py [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ladder_edges(spark, depth: int):
    """Cascade ladder of peel depth ``depth`` at k=3 (see module doc)."""
    from pyspark.sql import functions as F

    d = depth
    rails = spark.range(d + 1).selectExpr(
        "id + 1000000 AS u",
        "CAST(NULL AS BIGINT) AS v",
    )
    # circulant rails: r_i ~ r_{i+1}, r_{i+2} (mod d+1) — degree 4
    rail_e = spark.range(d + 1).selectExpr(
        "id + 1000000 AS u",
        "pmod(id + 1, {n}) + 1000000 AS v".format(n=d + 1),
    ).unionAll(
        spark.range(d + 1).selectExpr(
            "id + 1000000 AS u",
            "pmod(id + 2, {n}) + 1000000 AS v".format(n=d + 1),
        )
    )
    # ladder spine u_i ~ u_{i+1} and anchors u_i ~ r_i; the far end
    # gets a SECOND rail anchor so the cascade runs from u_0 only —
    # one node per round, peel depth exactly ~d (without it both ends
    # peel simultaneously and the depth halves)
    spine = spark.range(d).selectExpr("id AS u", "id + 1 AS v")
    anchor = spark.range(d + 1).selectExpr("id AS u", "id + 1000000 AS v")
    far = spark.range(1).selectExpr(
        f"CAST({d} AS BIGINT) AS u", "CAST(1000000 AS BIGINT) AS v"
    )
    e = rail_e.unionAll(spine).unionAll(anchor).unionAll(far)
    # canonical undirected form (u < v), dedup
    return (
        e.selectExpr("least(u, v) AS u", "greatest(u, v) AS v")
        .distinct()
    )


def hindex_coreness(edges, max_rounds: int, stats: dict):
    """Lü et al. 2016 H-operator coreness: c0 = degree; c_{t+1}(v) =
    H-index of neighbors' c_t; fixpoint = coreness. Same per-round
    shape as peeling (one aggregate over the edge list), evaluated
    here as the candidate round-bounded fallback."""
    from pyspark.sql import functions as F

    sym = edges.selectExpr("u AS a", "v AS b").unionAll(
        edges.selectExpr("v AS a", "u AS b")
    ).localCheckpoint(eager=True)
    c = sym.groupBy("a").agg(F.count(F.lit(1)).alias("c")) \
        .localCheckpoint(eager=True)
    rounds = 0
    while rounds < max_rounds:
        # H-index of each node's neighbor c-values: sort desc, largest
        # rank r with value >= r — one window-free aggregate via
        # collect_list on bounded degree... degrees here are <= 5, so
        # the per-node list is tiny; general graphs would need the
        # sort-based form
        nb = sym.join(c.withColumnRenamed("a", "b"), "b") \
            .select("a", "c")
        nxt = (
            nb.groupBy("a")
            .agg(F.sort_array(F.collect_list("c"), False).alias("cs"))
            .select(
                "a",
                F.expr(
                    "size(filter(transform(cs, (x, i) -> x >= i + 1),"
                    " t -> t))"
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(c.withColumnRenamed("c", "c_old"), "a")
            .filter(F.col("c") != F.col("c_old"))
            .limit(1)
            .count()
        )
        rounds += 1
        c = nxt
        if changed == 0:
            break
    stats["rounds"] = rounds
    return c


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from maillog2db_spark.operators import graph as gr
    from maillog2db_spark.session import get_spark

    spark = get_spark("scale_rehearsal_kcore", cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

    for depth in (8, 24, 48):
        e = ladder_edges(spark, depth)
        st: dict = {}
        t0 = time.time()
        core = gr.kcore(e, k=3, stats=st)
        n_core = core.count()
        dt = time.time() - t0
        hst: dict = {}
        t0 = time.time()
        hindex_coreness(e, max_rounds=2 * depth + 10, stats=hst)
        hdt = time.time() - t0
        print(
            f"ladder depth={depth}: peel rounds={st['rounds']} "
            f"({dt:.1f} s, core={n_core}), "
            f"h-index rounds={hst['rounds']} ({hdt:.1f} s)",
            flush=True,
        )

    # budget contract: depth > 64 raises loudly
    e = ladder_edges(spark, 80)
    try:
        gr.kcore(e, k=3).count()
        print("depth=80: UNEXPECTEDLY CONVERGED", flush=True)
    except RuntimeError as ex:
        print(f"depth=80: raised as designed ({ex})", flush=True)

    # realistic reference point: the sf0.01 co-purchase graph
    from maillog2db_spark.operators.corpus_analytics import (
        BASKET_MIN_SUPPORT,
        _li_pair_counts,
    )
    from pyspark.sql import functions as F

    counts = _li_pair_counts(spark, "/root/testdata/sf0.01")
    edges = counts.filter(F.col("w") >= BASKET_MIN_SUPPORT).select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    )
    st = {}
    gr.kcore(edges, stats=st).count()
    print(f"sf0.01 co-purchase: peel rounds={st['rounds']}", flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
