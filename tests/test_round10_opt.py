"""Round-10 OPTIMIZATION pins: each test freezes the equivalence
argument behind a restructured operator internal (the optimization
round's contract: identical results, cheaper plan/loop shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_trainer_trajectory_independent_of_tok_passthrough(spark):
    """The r10 trainer unification serves doc_bpe_train_merges /
    doc_wordpiece_train from the tok-keyed session training. Pin the
    argument: the merge trajectory is a deterministic function of the
    (s, freq) multiset — the passthrough tok column cannot change it."""
    from maillog2db_spark.operators.text import _bpe_train, _wordpiece_train

    rows = [("banana", 5), ("bandana", 3), ("cabana", 2), ("ban", 7)]
    syms = spark.createDataFrame(
        [(t, f, " ".join(t)) for t, f in rows], "tok string, freq long, s string"
    )
    syms_nf = syms.select("freq", "s")
    for trainer in (_bpe_train, _wordpiece_train):
        _, m_tok = trainer(spark, syms, 3, keys=("tok", "freq"))
        _, m_freq = trainer(spark, syms_nf, 3, keys=("freq",))
        assert m_tok == m_freq, trainer.__name__


def test_cms_vocab_grain_equals_occurrence_grain(spark):
    """The r10 CMS build aggregates exact counts first (cells are
    additive); pin cell equality against the occurrence-grain build."""
    from maillog2db_spark.operators.text import CMS_D, _cms_bucket

    toks = spark.createDataFrame(
        [(t,) for t in "a b a c a b d e a b".split()], "tok string"
    )
    buckets = lambda col: F.array(*[_cms_bucket(col, i) for i in range(CMS_D)])
    occ = (
        toks.select(F.posexplode(buckets(F.col("tok"))).alias("depth", "bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    voc = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        .select(F.posexplode(buckets(F.col("tok"))).alias("depth", "bucket"), "n")
        .groupBy("depth", "bucket")
        .agg(F.sum("n").alias("c"))
    )
    a = {(r.depth, r.bucket): r.c for r in occ.collect()}
    b = {(r.depth, r.bucket): r.c for r in voc.collect()}
    assert a == b


def test_covariance_upper_triangle_equals_full_grid(spark):
    """The r10 covariance builds only the in-row upper triangle; pin
    that the surviving cells equal the full-grid-then-filter form."""
    from maillog2db_spark.operators.similarity import embedding_covariance
    import maillog2db_spark.operators.similarity as sim

    import numpy as np

    rng = [[float((i * 7 + j * 3) % 5) / 4 - 0.5 for j in range(64)] for i in range(20)]
    # independent dense check: quantized means, per-row centered
    # products, floor fixed-point — the documented contract
    import math

    means = [sum(r[j] for r in rng) / len(rng) for j in range(64)]
    mq = [math.floor(m * 1_000_000 + 0.5) / 1_000_000 for m in means]
    expect = {}
    for i in range(64):
        for j in range(i, 64):
            s = 0
            for r in rng:
                p = (r[i] - mq[i]) * (r[j] - mq[j])
                s += math.floor(p * sim.COV_SCALE + 0.5)
            expect[(i, j)] = (len(rng), s)

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, [float(v) for v in r], i % 3) for i, r in enumerate(rng)],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        got = {
            (r.i, r.j): (r.n_vectors, r.sum_e12)
            for r in embedding_covariance(spark, td).collect()
        }
    # float32 storage: recompute expectation from the float32-rounded
    # values the parquet round-trip produces
    rng32 = [[float(np.float32(v)) for v in r] for r in rng]
    means = [sum(r[j] for r in rng32) / len(rng32) for j in range(64)]
    mq = [math.floor(m * 1_000_000 + 0.5) / 1_000_000 for m in means]
    expect = {}
    for i in range(64):
        for j in range(i, 64):
            s = 0
            for r in rng32:
                p = (r[i] - mq[i]) * (r[j] - mq[j])
                s += math.floor(p * sim.COV_SCALE + 0.5)
            expect[(i, j)] = (len(rng32), s)
    assert got == expect


def test_star_components_fixpoint_probe_shapes(spark):
    """The r10 one-groupBy fixpoint probe must still catch BOTH
    violation shapes: depth (a dst that is also a src) and fan-out (a
    src with two roots — the V-shape that a depth-only probe misses)."""
    from maillog2db_spark.operators.graph import star_components

    # V-shape: (1,3),(2,3) — one component, labels all 1
    v = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got = {r.node: r.comp for r in star_components(v).collect()}
    assert got == {1: 1, 2: 1, 3: 1}

    # chain: 1-2-3-4 — one component
    c = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    got = {r.node: r.comp for r in star_components(c).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # two components + self-loop noise
    g = spark.createDataFrame(
        [(5, 6), (6, 5), (7, 7), (8, 9)], "src long, dst long"
    )
    got = {r.node: r.comp for r in star_components(g).collect()}
    assert got == {5: 5, 6: 5, 8: 8, 9: 8}


def test_referential_integrity_key_grain_counts(spark, tmp_path):
    """The r10 key-grain pre-aggregation must preserve row-grain
    semantics: multiplicities, NULL keys, and orphan counts."""
    import os

    from maillog2db_spark.operators.relational_ext import referential_integrity

    td = str(tmp_path)
    spark.createDataFrame(
        [(1, 100), (2, 100), (3, None)], "o_orderkey long, o_custkey long"
    ).write.parquet(os.path.join(td, "orders.parquet"))
    # lineitem->orders: key 1 x3 (multiplicity), key 2 x1, NULL x2,
    # orphan 99 x1  ->  n_child 7, n_null 2, n_orphans 1
    spark.createDataFrame(
        [(1, 7, 8)] * 3 + [(2, 7, 8), (None, 7, 8), (None, 7, 8), (99, 7, 8)],
        "l_orderkey long, l_partkey long, l_suppkey long",
    ).write.parquet(os.path.join(td, "lineitem.parquet"))
    spark.createDataFrame([(7,)], "p_partkey long").write.parquet(
        os.path.join(td, "part.parquet")
    )
    spark.createDataFrame([(8, 20)], "s_suppkey long, s_nationkey long").write.parquet(
        os.path.join(td, "supplier.parquet")
    )
    spark.createDataFrame([(100, 20)], "c_custkey long, c_nationkey long").write.parquet(
        os.path.join(td, "customer.parquet")
    )
    spark.createDataFrame([(20, 30)], "n_nationkey long, n_regionkey long").write.parquet(
        os.path.join(td, "nation.parquet")
    )
    spark.createDataFrame([(30,)], "r_regionkey long").write.parquet(
        os.path.join(td, "region.parquet")
    )
    rows = {
        r.relationship: (r.n_child, r.n_null_keys, r.n_orphans)
        for r in referential_integrity(spark, td).collect()
    }
    assert rows["lineitem->orders"] == (7, 2, 1)
    assert rows["orders->customer"] == (3, 1, 0)
    assert rows["lineitem->part"] == (7, 0, 0)
    assert rows["nation->region"] == (1, 0, 0)
