"""Round-8 operator tests: the StandardScaler overflow boundary, the
length-gated duplicate-span dedup (ExactSubstr / C4 family), and its
streaming admission gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_standard_scaler_exact_past_bigint_overflow(spark):
    """The round-7 'weak': bigint moment sums silently wrap once
    n·sxx leaves int64 (~3e3 adversarial unit-scale vectors). The
    shipped DECIMAL(38,0) path must match an arbitrary-precision
    Python oracle on a corpus sized PROVABLY past that bound."""
    from maillog2db_spark.operators.selection import scaler_from

    n = 6000
    # deterministic unit-scale xq in [-1e6, 1e6] (Weyl sequence)
    xs = [((i * 2654435761) % 2000001) - 1000000 for i in range(n)]
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    # the boundary is real: a bigint n*sxx (and sx*sx) would wrap
    assert n * sxx > 2**63 - 1
    el = spark.createDataFrame(
        [(i, 0, x) for i, x in enumerate(xs)],
        "vec_id bigint, dim int, xq bigint",
    )
    got = {r.vec_id: r.z_ppm for r in scaler_from(el).collect()}
    var_n2 = n * sxx - sx * sx  # exact Python int, no wrap
    den = math.sqrt(float(var_n2))
    for i, x in enumerate(xs):
        want = math.floor(float(x * n - sx) / den * 1_000_000 + 0.5)
        assert got[i] == want, (i, got[i], want)
