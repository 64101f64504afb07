"""BPE-trainer scale rehearsal: time N merges of the incremental
trainer (`text._bpe_train`) against a synthetic Zipf word-frequency
vocabulary far richer than the driver corpus' (whose token vocab is
tiny), and compare per-merge cost against the naive full-recount
formulation (the oracle path) on the same input.

What this certifies:
  * per-merge cost is bound by AFFECTED-word volume (the words
    containing the fused pair), not by a full vocab recount;
  * the merge loop's partition count stays flat (the union-doubling
    pathology this rehearsal originally caught: 32 -> 32k tasks by
    merge 15 before the coalesce fix);
  * a 100+-merge run is feasible to time at all — the precondition
    for the documented 30k-merge production target.

Usage: PYTHONPATH=/root/repo python tools/scale_rehearsal_bpe.py \
           [n_words] [n_merges]
"""

from __future__ import annotations

import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from maillog2db_spark.session import get_spark  # noqa: E402
from maillog2db_spark.operators import text as tx  # noqa: E402


def synth_vocab(spark, n_words: int):
    """Zipf word-frequency table: words are letter n-grams drawn with
    a skewed letter distribution (so pair counts have real structure),
    freq ~ Zipf rank. Deterministic (seeded)."""
    rng = random.Random(42)
    letters = "etaoinshrdlucmfwypvbgkjqxz"
    weights = [1.0 / (i + 1) for i in range(len(letters))]
    rows = []
    seen = set()
    while len(rows) < n_words:
        ln = rng.randint(3, 12)
        w = "".join(rng.choices(letters, weights=weights, k=ln))
        if w in seen:
            continue
        seen.add(w)
        rank = len(rows) + 1
        rows.append((100_000_000 // rank + 1, " ".join(w)))
    return spark.createDataFrame(rows, "freq bigint, s string").repartition(32)


def recount_train(spark, syms, n_iters):
    """The naive formulation: full pair recount per merge (the oracle
    path) — timed for comparison."""
    s = syms.localCheckpoint(eager=True)
    per_merge = []
    for _ in range(n_iters):
        t0 = time.time()
        best = (
            tx._bpe_pair_counts(s, F.col("freq"))
            .orderBy(F.col("cnt").desc(), F.col("l").desc(), F.col("r").desc())
            .limit(1)
            .collect()
        )
        l, r = best[0].l, best[0].r
        pat, fused = f" {l} {r} ", f" {l}{r} "
        padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        s = s.select(
            "freq", F.trim(F.replace(padded, F.lit(pat), F.lit(fused))).alias("s")
        ).localCheckpoint(eager=True)
        per_merge.append(time.time() - t0)
    return per_merge


def main():
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("bpe_rehearsal", cpus=32)
    syms = synth_vocab(spark, n_words).localCheckpoint(eager=True)
    print(f"vocab: {n_words} words")

    t0 = time.time()
    stats: list = []
    final, merges = tx._bpe_train(
        spark, syms, n_merges, keys=("freq",), stats=stats
    )
    t_inc = time.time() - t0
    print(
        f"incremental: {n_merges} merges in {t_inc:.1f}s "
        f"({t_inc / n_merges * 1000:.0f} ms/merge)"
    )
    print(f"  partitions after run: {final.rdd.getNumPartitions()} (flat)")
    print(f"  last merges: {merges[-3:]}")
    # cost-vs-affected-volume correlation: decade means of (pair mass,
    # ms/merge) — incremental cost must TRACK the fused pair's mass
    for lo in range(0, n_merges, max(10, n_merges // 10)):
        chunk = stats[lo : lo + max(10, n_merges // 10)]
        if chunk:
            print(
                f"  merges {chunk[0][0]}-{chunk[-1][0]}: "
                f"mean pair mass {sum(c for _, c, _ in chunk) / len(chunk):,.0f}, "
                f"{sum(t for _, _, t in chunk) / len(chunk) * 1000:.0f} ms/merge"
            )

    n_cmp = min(10, n_merges)
    per = recount_train(spark, syms, n_cmp)
    print(
        f"recount baseline: {n_cmp} merges, "
        f"{sum(per) / n_cmp * 1000:.0f} ms/merge"
    )
    # sanity: both formulations pick identical first merges
    rec_first = []
    s = syms.localCheckpoint(eager=True)
    for _ in range(min(5, n_merges)):
        best = (
            tx._bpe_pair_counts(s, F.col("freq"))
            .orderBy(F.col("cnt").desc(), F.col("l").desc(), F.col("r").desc())
            .limit(1)
            .collect()
        )
        l, r = best[0].l, best[0].r
        rec_first.append((l, r))
        pat, fused = f" {l} {r} ", f" {l}{r} "
        padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        s = s.select(
            "freq", F.trim(F.replace(padded, F.lit(pat), F.lit(fused))).alias("s")
        ).localCheckpoint(eager=True)
    assert [(m[1], m[2]) for m in merges[:5]] == rec_first, (
        merges[:5],
        rec_first,
    )
    print("first-5-merge equivalence vs recount: OK")


if __name__ == "__main__":
    main()
