"""Coreset / data-selection operators over the embedding corpus.

Greedy k-center coreset selection (Gonzalez 1985 farthest-point
traversal; the data-selection formulation of Sener & Savarese, ICLR
2018 "Active Learning for Convolutional Neural Networks: A Core-Set
Approach", arXiv:1708.00489): pick K points so every corpus vector is
close to some picked center — the diversity-maximizing subset selection
a training-data pipeline uses to build a small representative corpus
slice (the complement of near-dup REMOVAL: instead of dropping the
redundant, keep the maximally spread).

Reference parity note: the reference engine (maillog2db.go) has no
vector surface at all — this module is part of the engine's
training-data-pipeline extension mandate, not a port.

Determinism contract: distances ride the knn 6dp-cosine contract
(similarity.cosine_topk) lifted to exact-ppm bigints —
``dissim_ppm = 1_000_000 - cos_ppm`` with the NULL-cosine sentinel
(zero-norm vectors sort maximally far, same sentinel as MMR). Every
greedy step is then integer arithmetic: argmax of min-dissimilarity,
ties to the lowest vec_id. The oracle unrolls the identical K steps as
CTEs (the MMR / BPE-trainer pattern), so the gate certifies the whole
selection trajectory plus the final assignment census.

Scale shape — the INCREMENTAL-MIN formulation with measured memory
discipline (tools/scale_rehearsal_kcenter.py tried all three): each
selected center is ONE collected bounded row (the BPE winning-pair
precedent) whose embedding re-enters the plan as LITERALS, so a step
is one narrow map (``least(mind, dissim-to-new-center)`` — exactly
one dot product per row) + one TakeOrdered(1); no joins, no shuffles.
The running min column is persisted and the one-step-older copy
unpersisted after each top-1 action, so at most TWO corpus-resident
copies exist — the rehearsal measured the checkpoint-accumulating
variant 2.2× superlinear at 2M vectors (K corpus copies) and a
stateless recount variant 5× superlinear (K²·N/2 interpreted dissim
evaluations); the persisted K·N form is the one that stays linear.
The assignment census is one stateless scan: an in-row ``array_min``
over the literal center-struct array, then a K-group
map-side-combined count.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _DOT_DUCK, _dot, _embeddings, _norm

KCENTER_K = 8  # unrolled in the oracle SQL; keep the two in sync
_SENT_PPM = -2_000_000  # below any real cosine ppm; NULL-cosine sentinel


def _dissim_ppm(a_emb, b_emb, ab_nrm):
    """Exact-ppm dissimilarity 1e6 - cos_ppm at the knn contract's 6dp
    grain, quantized with the floor fixed-point idiom
    ``floor(cos·1e6 + 0.5)`` — NOT builtin round(,6), whose
    Spark-BigDecimal-vs-DuckDB-binary boundary divergence would be
    amplified here: one flipped ppm can reroute every later center of
    the greedy trajectory. floor over the identical IEEE quotient is
    bit-equal on both engines. NULL cosine (zero-norm side) floors to
    the sentinel -> maximally far."""
    cos_ppm = F.coalesce(
        F.floor(
            F.try_divide(_dot(a_emb, b_emb), ab_nrm) * 1_000_000 + F.lit(0.5)
        ),
        F.lit(_SENT_PPM),
    )
    return (F.lit(1_000_000) - cos_ppm).cast("bigint")


def _centers_literal(centers) -> "F.Column":
    """The collected centers as ONE constant-folded literal array of
    (cemb, cnrm, step) structs. float32 -> Python float -> double
    literal is exact, and ``_dot`` casts the frame side to double the
    same way, so the arithmetic is bit-identical to a frame-frame
    join. A single shared literal subtree matters: an earlier
    formulation built s SEPARATE 64-literal dissim trees under one
    least() and Catalyst's analysis (CSE over duplicated big trees)
    dominated wall time — 13.8 s for 2k vectors at sf0.1, vs ~2 s
    with the one-array form."""
    return F.array(*[
        F.struct(
            F.array(*[F.lit(float(v)) for v in c.emb]).alias("cemb"),
            F.lit(float(c.nrm)).alias("cnrm"),
            F.lit(i + 1).cast("int").alias("step"),
        )
        for i, (c, _) in enumerate(centers)
    ])


def _argmin_center(carr) -> "F.Column":
    """(dissim, step) struct of the row's NEAREST center (ties to the
    earliest step) — in-row argmin, no join, no shuffle."""
    return F.array_min(
        F.transform(
            carr,
            lambda c: F.struct(
                _dissim_ppm(
                    F.col("emb"), c["cemb"], F.col("nrm") * c["cnrm"]
                ).alias("d"),
                c["step"].alias("step"),
            ),
        )
    )


def kcenter_select(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Greedy k-center over the full embedding corpus; returns one row
    per selected center: (step, center_id, radius_ppm, n_assigned).

    radius_ppm at step s is the max-min-dissimilarity that step's
    center was chosen at (the coverage radius the corpus had BEFORE the
    center joined; step 1 seeds at the lowest vec_id with radius 0).
    n_assigned is the final census: each corpus vector assigned to its
    nearest center (ties to the earliest step).
    """
    from .similarity import embeddings_with_nrm

    e = embeddings_with_nrm(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("emb"), "nrm"
    )
    return kcenter_from(e, k)


def _dissim_to_literal(center) -> "F.Column":
    """Dissimilarity of the frame's (emb, nrm) to ONE collected center
    embedded as literals — the per-step incremental update needs
    exactly one of these per row."""
    c_emb = F.array(*[F.lit(float(v)) for v in center.emb])
    return _dissim_ppm(
        F.col("emb"), c_emb, F.col("nrm") * F.lit(float(center.nrm))
    )


def kcenter_from(
    e: DataFrame, k: int, stats: list | None = None
) -> DataFrame:
    """The greedy loop from a projected (vec_id, emb, nrm) frame —
    shared by the registered query above and the scale rehearsal
    (tools/scale_rehearsal_kcenter.py), which feeds synthetic corpora
    and collects per-step wall times through ``stats``.

    State discipline (set by the rehearsal's measurements): the
    running min-dissim column is persisted MEMORY_AND_DISK and the
    one-step-older state is unpersisted right after each top-1 action
    materializes the current one — at most TWO corpus-resident copies
    ever, which is what keeps the per-step cost linear through the
    2M-vector decade (the first formulation checkpointed every step
    and went 2.2x superlinear as K copies accumulated; a stateless
    recount went 5x superlinear from K^2*N/2 interpreted dissim
    evaluations). Everything — base included — is released
    DETERMINISTICALLY before returning: the result is K bounded rows,
    so the whole computation collects inside (the BPE-trainer return
    pattern) and no corpus-sized cache outlives the call (the
    rehearsal measured leaked per-size localCheckpoint bases driving
    a later same-JVM run into eviction thrash: steps of 0.1 s jumped
    to 16 s mid-loop). On block eviction the recompute walks the
    projection chain back through base to the source scan — K narrow
    one-dissim maps, the recount cost as a worst-case fallback, never
    the steady state."""
    from pyspark import StorageLevel

    spark = e.sparkSession
    schema = "step int, center_id bigint, radius_ppm bigint, n_assigned bigint"
    base = e.persist(StorageLevel.MEMORY_AND_DISK)  # norms computed once
    # step 1: deterministic seed at the lowest vec_id (1 bounded row)
    _t0 = _time.time()
    seed = base.orderBy(F.asc("vec_id")).limit(1).collect()
    if stats is not None:
        stats.append((1, _time.time() - _t0))
    if not seed:
        base.unpersist()
        return spark.createDataFrame([], schema)
    centers = [(seed[0], 0)]  # (collected row, radius at selection)

    def _m_update(center, step: int, old=None):
        """(d, step) struct of the nearest center so far. struct least
        compares d first, then step — so ties at equal d keep the
        EARLIEST step, exactly the argmin-census tie rule."""
        cand = F.struct(
            _dissim_to_literal(center).alias("d"),
            F.lit(step).cast("int").alias("step"),
        )
        return cand if old is None else F.least(old, cand)

    # r10 census restructure: the running-min column is a (d, step)
    # STRUCT, so after the loop the final state already knows every
    # remaining row's nearest center — the census is one groupBy of
    # materialized state plus K driver-side rows for the centers
    # themselves, replacing the K·N literal-array argmin re-evaluation
    # (measured ~2 s of the query's 3.4 s warm wall at sf0.1; the
    # selected trajectory, radii, and census are value-identical —
    # struct-least ties replicate the argmin's earliest-step rule, and
    # a center's own assignment is its selection-time struct when its
    # distance to an earlier center is exactly 0, its own step
    # otherwise — the same verdict the literal argmin produced).
    state = (
        base.filter(F.col("vec_id") != int(seed[0].vec_id))
        .select(
            "vec_id", "emb", "nrm",
            _m_update(seed[0], 1).alias("m"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev = None
    # own-assignment step per selected center (driver-side, K bounded):
    # seed is assigned to itself
    own_steps = [1]
    for step in range(2, k + 1):
        _t0 = _time.time()
        # farthest remaining point: TakeOrdered(1) — map-side top-1
        # per partition, never a global sort; the action materializes
        # every partition of `state` into the cache
        nxt = (
            state.orderBy(F.desc("m.d"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()  # safe: current state is now materialized
        if stats is not None:
            stats.append((step, _time.time() - _t0))
        if not nxt:
            break  # corpus smaller than K: trajectory ends gracefully
        m_row = nxt[0]["m"]
        centers.append((nxt[0], int(m_row["d"])))
        # the center's own census slot replicates the argmin over ALL
        # centers: its self-dissimilarity is 0 for a real vector but
        # the NULL-cosine SENTINEL distance for a zero-norm one
        # (dissim(c, c) rides the same try_divide → sentinel path);
        # an earlier center at d <= self_d claims it (struct-least
        # ties go to the earlier step), else it assigns to itself.
        self_d = 0 if float(nxt[0]["nrm"]) > 0.0 else 1_000_000 - _SENT_PPM
        own_steps.append(
            int(m_row["step"]) if int(m_row["d"]) <= self_d else step
        )
        prev = state
        state = (
            state.filter(F.col("vec_id") != int(nxt[0].vec_id))
            .select(
                "vec_id", "emb", "nrm",
                _m_update(nxt[0], step, old=F.col("m")).alias("m"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # census over the FINAL state (every center applied, selected rows
    # excluded): one K-group map-side-combined count
    census = {
        r.step: int(r.n_assigned)
        for r in state.groupBy(F.col("m.step").alias("step"))
        .agg(F.count(F.lit(1)).alias("n_assigned"))
        .collect()
    }
    for s in own_steps:
        census[s] = census.get(s, 0) + 1
    state.unpersist()
    if prev is not None:
        prev.unpersist()
    base.unpersist()
    return spark.createDataFrame(
        [
            (i + 1, int(c.vec_id), r, int(census[i + 1]))
            for i, (c, r) in enumerate(centers)
            if i + 1 in census and census[i + 1] > 0
        ],
        schema,
    )


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: greedy k-center coreset of KCENTER_K centers
    over the whole embedding table, with the selection trajectory
    (coverage radius per step) and the final assignment census."""
    return kcenter_select(spark, sf_dir, KCENTER_K)


def standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed StandardScaler over the embedding corpus: per
    dimension, z = (x − μ)/σ (population σ) — the feature-normalization
    pass embedding pipelines run before clustering/whitening-sensitive
    retrieval, at the grain a 100 TB job wants (one narrow pass, stats
    broadcast back).

    Determinism (the exact-integer-moments pattern the sf0.1 sweep
    made policy): each element quantizes to xq = floor(x·1e6 + 0.5)
    FIRST, so the per-dim moment sums are exact integers both engines
    agree on bit-for-bit regardless of fold order, and
    z_ppm = floor((xq·n − sx)/sqrt(n·sxx − sx²)·1e6 + 0.5) is one
    IEEE divide/sqrt over identical operands. Zero-variance dims emit
    NULL via nullif.

    Overflow posture (the round-7 "weak" closed): the moment sums and
    the n·sxx − sx² identity run in DECIMAL(38,0) on Spark and HUGEINT
    (128-bit) on DuckDB — bigint sums would silently wrap at
    n·sxx ≈ 2^63, i.e. from ~3e3 adversarial / ~2e4–7e4 typical
    unit-scale vectors, the classic "green at sf0.1, wrong at 100×"
    failure. The wide types are exact to n ≈ 1e13 unit-scale vectors
    (sx² ≤ ~1e38), and past THAT bound both engines fail loudly-ish
    (Spark non-ANSI decimal overflow → NULL z_ppm, DuckDB hugeint
    raises) rather than silently diverging. Decimal→double and
    hugeint→double casts are both correctly-rounded, so the one float
    divide/sqrt still sees identical operands.
    tests/test_round8.py proves the bound: a synthetic corpus where
    n·sxx provably exceeds 2^63 matches an arbitrary-precision Python
    oracle exactly.

    Plan shape: one posexplode scan + a map-side-combined 64-group
    aggregate, the 64-row stats table broadcast back onto the same
    exploded scan, then a stateless per-element map. Output grain is
    (vec_id, dim) with integer z_ppm — nothing float ever crosses an
    engine boundary unquantized."""
    e = _embeddings(spark, sf_dir)
    el = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    return scaler_from(el)


def scaler_from(el: DataFrame) -> DataFrame:
    """The z-score math from a quantized (vec_id, dim, xq) element
    frame — shared by the registered query above and the bigint-
    overflow boundary test, which feeds a synthetic corpus sized so
    n·sxx leaves int64. All moment arithmetic is DECIMAL(38,0); see
    standard_scaler's docstring for the bound."""
    stats = el.groupBy("dim").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("sx"),
        # cast BEFORE the square — a bigint xq*xq would itself wrap
        # past |xq| ~ 3e9 (decimal(19)² promotes to decimal(38,0))
        F.sum(
            F.col("xq").cast("decimal(19,0)")
            * F.col("xq").cast("decimal(19,0)")
        ).alias("sxx"),
    )
    return el.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "dim",
        F.expr(
            "CAST(floor(CAST(xq * n - sx AS DOUBLE)"
            " / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)), 0.0)"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("z_ppm"),
    )


STANDARD_SCALER_SQL = """
WITH el AS (
  SELECT vec_id, CAST(d.range AS INT) AS dim,
         CAST(floor(CAST(embedding[CAST(d.range AS INT) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS xq
  FROM embeddings CROSS JOIN range(64) d
), stats AS (
  -- HUGEINT (128-bit) moments: the DuckDB twin of the Spark side's
  -- DECIMAL(38,0) sums; bigint would wrap at n*sxx ~ 2^63
  SELECT dim, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(xq AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS sxx
  FROM el GROUP BY 1
)
SELECT e.vec_id, e.dim,
       CAST(floor(CAST(e.xq * s.n - s.sx AS DOUBLE)
                  / nullif(sqrt(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)),
                           0.0)
                  * 1000000 + 0.5) AS BIGINT) AS z_ppm
FROM el e JOIN stats s USING (dim)
"""


def _kcenter_oracle_sql() -> str:
    """Unrolled-CTE oracle: re-derives every greedy step independently
    (the MMR pattern), then the assignment census — the gate certifies
    the full trajectory, not one step."""
    dis = (
        "CAST(1000000 - coalesce(floor("
        + _DOT_DUCK.format(a="{a}", b="{b}")
        + " / ({na} * {nb}) * 1000000 + 0.5), "
        + str(_SENT_PPM)
        + ") AS BIGINT)"
    )

    def d(a, na, b, nb):
        return dis.format(a=a, b=b, na=na, nb=nb)

    parts = [
        f"""WITH e AS (
  SELECT vec_id, embedding AS emb,
         sqrt({_DOT_DUCK.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
), sel1 AS (
  SELECT vec_id, emb, nrm, CAST(0 AS BIGINT) AS radius
  FROM e ORDER BY vec_id LIMIT 1
), st1 AS (
  SELECT t.vec_id, t.emb, t.nrm,
         {d('t.emb', 't.nrm', 's.emb', 's.nrm')} AS mind
  FROM e t CROSS JOIN sel1 s WHERE t.vec_id <> s.vec_id
)"""
    ]
    for n in range(2, KCENTER_K + 1):
        parts.append(f""", sel{n} AS (
  SELECT vec_id, emb, nrm, mind AS radius
  FROM st{n - 1} ORDER BY mind DESC, vec_id LIMIT 1
)""")
        if n < KCENTER_K:
            parts.append(f""", st{n} AS (
  SELECT t.vec_id, t.emb, t.nrm,
         least(t.mind, {d('t.emb', 't.nrm', 's.emb', 's.nrm')}) AS mind
  FROM st{n - 1} t CROSS JOIN sel{n} s WHERE t.vec_id <> s.vec_id
)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT {n} AS step, vec_id, emb, nrm, radius FROM sel{n}"
        for n in range(1, KCENTER_K + 1)
    )
    parts.append(f""", centers AS (
  {union}
), assign AS (
  SELECT e.vec_id, c.step,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {d('e.emb', 'e.nrm', 'c.emb', 'c.nrm')}, c.step
         ) AS rn
  FROM e CROSS JOIN centers c
), census AS (
  SELECT step, CAST(count(*) AS BIGINT) AS n_assigned
  FROM assign WHERE rn = 1 GROUP BY step
)
SELECT CAST(c.step AS INT) AS step, c.vec_id AS center_id,
       c.radius AS radius_ppm, n.n_assigned
FROM centers c JOIN census n USING (step)""")
    return "".join(parts)


KCENTER_CORESET_SQL = _kcenter_oracle_sql()
