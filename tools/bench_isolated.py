#!/usr/bin/env python
"""Isolated per-query bench probe (the SCALING.md isolation protocol):
run a named list of queries in a FRESH session, each twice (best-of-2,
the bench.py convention), optionally priming another query family
first to reproduce registry-order cache residency. Usage:

    python tools/bench_isolated.py q1 q2 ...            # isolated
    python tools/bench_isolated.py --prime p1,p2 q1 ... # primed
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maillog2db_spark import queries as Q  # noqa: E402
from maillog2db_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    prime: list[str] = []
    if args and args[0] == "--prime":
        prime = args[1].split(",")
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_isolated")
    qs = Q.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    for name in prime:
        qs[name](spark, sf_dir).count()
    out = {}
    for name in args:
        runs = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps({"sf_dir": sf_dir, "primed": prime, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
