"""WordPiece-trainer scale rehearsal: time N merges of the incremental
trainer (`text._wordpiece_train`) on the SAME synthetic Zipf vocabulary
as the BPE rehearsal, and compare per-merge cost against the naive
full-recount formulation (the oracle path).

What this certifies, beyond what the BPE rehearsal already pins for
the shared mechanics (affected-word delta maintenance, flat partition
count):
  * the EXTRA per-merge work WordPiece adds — the unary count table's
    retract/assert deltas and the broadcast score join — stays
    vocab-grain: per-merge cost must track affected-word volume, same
    as BPE, with a roughly constant additive overhead;
  * the incremental (pair + unary) bookkeeping reproduces the naive
    recount's merge sequence exactly over a long horizon (the 3-merge
    registered query and fuzz tiers only certify short trajectories).

Usage: PYTHONPATH=/root/repo python tools/scale_rehearsal_wordpiece.py \
           [n_words] [n_merges]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from maillog2db_spark.session import get_spark  # noqa: E402
from maillog2db_spark.operators import text as tx  # noqa: E402
from tools.scale_rehearsal_bpe import synth_vocab  # noqa: E402


def _recount_best(s):
    """One naive WordPiece argmax: full pair + unary recount, score
    join, top-1 — the oracle formulation."""
    pairs = tx._bpe_pair_counts(s, F.col("freq"))
    unary = tx._unary_counts(s, F.col("freq"))
    ul = unary.select(F.col("sym").alias("l"), F.col("ucnt").alias("ul"))
    ur = unary.select(F.col("sym").alias("r"), F.col("ucnt").alias("ur"))
    return (
        pairs.filter(F.col("cnt") > 0)
        .join(ul, "l")
        .join(ur, "r")
        .select(
            "l", "r", "cnt",
            F.expr(tx._WP_SCORE.format(cnt="cnt", ul="ul", ur="ur")).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), F.col("l").desc(), F.col("r").desc())
        .limit(1)
        .collect()
    )


def recount_train(spark, syms, n_iters):
    s = syms.localCheckpoint(eager=True)
    per_merge = []
    seq = []
    for _ in range(n_iters):
        t0 = time.time()
        best = _recount_best(s)
        l, r = best[0].l, best[0].r
        seq.append((l, r))
        pat, fused = f" {l} {r} ", f" {l}{r} "
        padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        s = s.select(
            "freq", F.trim(F.replace(padded, F.lit(pat), F.lit(fused))).alias("s")
        ).localCheckpoint(eager=True)
        per_merge.append(time.time() - t0)
    return per_merge, seq


def main():
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("wordpiece_rehearsal", cpus=32)
    syms = synth_vocab(spark, n_words).localCheckpoint(eager=True)
    print(f"vocab: {n_words} words")

    t0 = time.time()
    stats: list = []
    final, merges = tx._wordpiece_train(
        spark, syms, n_merges, keys=("freq",), stats=stats
    )
    t_inc = time.time() - t0
    print(
        f"incremental: {n_merges} merges in {t_inc:.1f}s "
        f"({t_inc / n_merges * 1000:.0f} ms/merge)"
    )
    print(f"  partitions after run: {final.rdd.getNumPartitions()} (flat)")
    print(f"  last merges: {merges[-3:]}")
    for lo in range(0, n_merges, max(10, n_merges // 10)):
        chunk = stats[lo : lo + max(10, n_merges // 10)]
        if chunk:
            print(
                f"  merges {chunk[0][0]}-{chunk[-1][0]}: "
                f"mean pair mass {sum(c for _, c, _ in chunk) / len(chunk):,.0f}, "
                f"{sum(t for _, _, t in chunk) / len(chunk) * 1000:.0f} ms/merge"
            )

    n_cmp = min(10, n_merges)
    per, rec_seq = recount_train(spark, syms, n_cmp)
    print(
        f"recount baseline: {n_cmp} merges, "
        f"{sum(per) / n_cmp * 1000:.0f} ms/merge"
    )
    # long-horizon equivalence: the incremental trainer's first n_cmp
    # merges must equal the naive recount sequence exactly
    assert [(m[1], m[2]) for m in merges[:n_cmp]] == rec_seq, (
        merges[:n_cmp],
        rec_seq,
    )
    print(f"first-{n_cmp}-merge equivalence vs recount: OK")


if __name__ == "__main__":
    main()
