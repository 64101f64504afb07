#!/usr/bin/env python
"""Two-phase distributed rank vs the single-partition global window.

The round-5 rewrite routed abc_pareto / rfm_segments /
concurrent_sessions through ``windows.distributed_cumulative`` and the
sf0.1 bench got SLOWER (constant-factor overhead: one extra tiny
shuffle + offsets broadcast + localCheckpoint). This rehearsal answers
the question that trade depends on: where is the crossover, and how
fast does the single-task sort degrade past it?

Both paths compute the identical global rank + running sum over a
deterministic xxhash64-valued table (no RNG) and reduce to the same
checksum — asserted equal — so the timing comparison is
apples-to-apples down to the output.

Usage:
    PYTHONPATH=/root/repo python tools/scale_rehearsal_cumsum.py [n_rows] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from maillog2db_spark.session import get_spark
    from maillog2db_spark.operators.windows import distributed_cumulative

    spark = get_spark("scale_rehearsal_cumsum", cpus=cpus)
    p = spark.sparkContext.defaultParallelism

    df = (
        spark.range(0, n_rows, 1, p)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)).alias("v"),
        )
        .persist()
    )
    df.count()
    print(f"table: {n_rows} rows", flush=True)

    def checksum(ranked, rank_col, cum_col):
        # order-insensitive reduction over (rank, cumsum) — identical
        # iff every row got the same rank and running sum
        # row_number() is int32 — at 1e8 rows rank*31 overflows unless
        # widened first (ANSI mode turns that into a query kill)
        return ranked.agg(
            F.sum(
                F.col(rank_col).cast("bigint") * F.lit(31)
                + F.pmod(F.col(cum_col).cast("bigint"), F.lit(1_000_000_007))
            ).alias("c")
        ).collect()[0].c

    t0 = time.time()
    g = distributed_cumulative(df, [F.col("v"), F.col("id")], sum_cols=("v",))
    two_phase_sum = checksum(g, "_grank", "_gcum_v")
    t_two = time.time() - t0
    print(f"two-phase: {t_two:.1f} s", flush=True)

    t0 = time.time()
    w = Window.orderBy("v", "id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    single = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "cs", F.sum("v").over(cum)
    )
    single_sum = checksum(single, "rk", "cs")
    t_one = time.time() - t0
    print(f"single-partition window: {t_one:.1f} s", flush=True)

    assert two_phase_sum == single_sum, (two_phase_sum, single_sum)
    print(
        f"CHECKSUMS EQUAL; speedup {t_one / t_two:.2f}x at {n_rows} rows",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
