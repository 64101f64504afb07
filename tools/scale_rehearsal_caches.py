#!/usr/bin/env python
"""Scale rehearsal for the round-9 session-cache bases: build cost and
resident size of the materialize-once tables (_doc_toks, _span_dup_occ,
winnow_overlap_kept, kn_bgc, kn3_tgc) across the sf0.001 → 0.1 corpus
decade (100× docs). The claim under test: build cost scales linearly
with corpus size and the resident rows are bounded by the documented
grains (tokens / duplicate occurrences / capped fingerprints /
n-gram types), so the pattern survives a further 100× with partition
spill, exactly like the pre-existing reps/minhash caches.

Run ISOLATED (no concurrent Spark) — the standing admissibility rule.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maillog2db_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = {}
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        spark = get_spark(f"cache_rehearsal_{sf}")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        from maillog2db_spark.operators import corpus_analytics as ca
        from maillog2db_spark.operators import dedup, quality

        row = {}
        for name, fn in (
            ("doc_toks", lambda: dedup._doc_toks(spark, sf_dir)),
            ("span_dup_occ", lambda: ca._span_dup_occ(spark, sf_dir)),
            ("winnow_kept", lambda: quality._overlap_kept(spark, sf_dir)),
            ("kn_bgc", lambda: ca._kn_model(spark, sf_dir)[0]),
            ("kn3_tgc", lambda: ca._kn3_tgc(spark, sf_dir)),
        ):
            t0 = time.time()
            n = fn().count()  # materializes the cache
            row[name] = {"rows": n, "build_s": round(time.time() - t0, 2)}
        out[sf] = row
        spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
