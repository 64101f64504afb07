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

Scale shape — the LAZY-GREEDY BUFFER formulation (r11; the r10 form
ran one TakeOrdered(1) job per center, so K-1 driver round trips of
plan construction + scheduling dominated the wall at every tested
scale — ~2.5 s of a 3.9 s sf0.1 query was per-job overhead): ONE
TakeOrdered(J) job collects the J remaining rows farthest from the
seed, and because every non-collected row's running min-dissim can
only SHRINK as centers are added, the J-th collected value is a
standing upper bound on the outside world — any buffer row whose
updated min-dissim still meets it is PROVABLY the global argmax, so
the greedy step resolves on the driver with zero cluster work. The
driver updates run the same vectorized scorer as the cluster
(``_np_dissim_ppm`` — exact IEEE op sequence, see its docstring), so
a certified selection is bit-equal to the distributed job it
replaces; when the certificate fails the buffer refills with one
TakeOrdered(J) under the full center chain. The per-row K×dim
multiply-add interior runs in NumPy behind ONE Arrow-batched pandas
UDF (guide §4.2) instead of Catalyst's interpreted higher-order-
function fold (measured ~2 s/corpus-pass at sf0.1). The assignment
census is one stateless pass of the same scorer over all K centers,
then a K-group map-side-combined count. Total: 3 jobs + refills
(zero at sf0.1) instead of K+2, identical trajectory bit-for-bit.
"""

from __future__ import annotations

import time as _time
from collections import namedtuple

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _DOT_DUCK, _embeddings

KCENTER_K = 8  # unrolled in the oracle SQL; keep the two in sync
_SENT_PPM = -2_000_000  # below any real cosine ppm; NULL-cosine sentinel

# buffer-selected center carried in the same (row-like, radius) shape
# the collect path produces: _nearest_pdf reads .emb / .nrm
_BufCenter = namedtuple("_BufCenter", ["vec_id", "emb", "nrm"])

_BUFFER_J = 2048  # lazy-greedy buffer floor; see kcenter_from


# Dissimilarity contract (both expression builders below): exact-ppm
# 1e6 - cos_ppm at the knn contract's 6dp grain, quantized with the
# floor fixed-point idiom ``floor(cos·1e6 + 0.5)`` — NOT builtin
# round(,6), whose Spark-BigDecimal-vs-DuckDB-binary boundary
# divergence would be amplified here: one flipped ppm can reroute
# every later center of the greedy trajectory. floor over the
# identical IEEE quotient is bit-equal on both engines. NULL cosine
# (zero-norm side) floors to the sentinel -> maximally far.


def _np_dissim_ppm(embs, nrms, c_emb, c_nrm: float):
    """Vectorized dissim-to-one-center over an (N, dim) float64 matrix
    — int64 ppm vector, shared by the executor-side scorer
    (``_nearest_pdf``) and the driver-side buffer updates, so both
    produce the IDENTICAL IEEE double op sequence the original
    Catalyst fold performed: the accumulation loops over DIMENSIONS in
    ascending order (vectorized across rows), each row seeing
    ``(((0.0 + t0) + t1) + …)``; multiply and add are separate NumPy
    ufuncs (no FMA), each correctly rounded like the JVM's double ops;
    division, ``*1e6``, ``+0.5`` and floor are the same elementwise
    scalar ops; a zero norm product takes the try_divide NULL →
    sentinel branch."""
    import numpy as np

    acc = np.zeros(len(embs))
    for j, v in enumerate(c_emb):
        acc += embs[:, j] * float(v)
    ab = nrms * c_nrm
    with np.errstate(divide="ignore", invalid="ignore"):
        ppm = np.floor(acc / ab * 1_000_000 + 0.5)
    ppm = np.where(ab == 0.0, float(_SENT_PPM), ppm)
    return (1_000_000 - ppm).astype(np.int64)


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


def _nearest_pdf(centers):
    """Vectorized nearest-center (d, step) scorer as ONE Arrow-batched
    pandas UDF over (emb, nrm) — guide §4.2: the K×dim multiply-add
    interior runs in NumPy instead of Catalyst's interpreted
    higher-order-function fold, which measured ~2 s/corpus-pass at
    sf0.1 for the 8-center chain (and an expanded codegen sum-of-
    products paid even more in analysis+janino compile per job).

    Bit-equality with the fold it replaces: the accumulation loops
    over DIMENSIONS in ascending order, vectorized ACROSS rows, so
    each row sees the identical IEEE double sequence
    ``(((0.0 + t0) + t1) + …)``; float32 embeddings widen exactly
    before the multiply; division, ``*1e6``, ``+0.5`` and floor are
    the same correctly-rounded scalar ops elementwise (no FMA — the
    multiply and add are separate NumPy ufuncs); a zero norm product
    takes the NULL→sentinel branch; struct-least ties resolve to the
    EARLIEST step because a later center replaces only on strictly
    smaller d. The same contract as ``_np_dissim_ppm``, which the
    driver uses on buffered rows."""
    import numpy as np

    c_embs = [[float(v) for v in c.emb] for c, _ in centers]
    c_nrms = [float(c.nrm) for c, _ in centers]

    @F.pandas_udf("d bigint, step int")
    def scorer(emb: pd.Series, nrm: pd.Series) -> pd.DataFrame:
        n = len(emb)
        if n == 0:
            return pd.DataFrame({"d": pd.Series([], dtype="int64"),
                                 "step": pd.Series([], dtype="int32")})
        e = np.stack(emb.to_numpy()).astype(np.float64)  # exact widening
        nr = nrm.to_numpy(dtype=np.float64)
        best_d = best_s = None
        for i, (ce, cn) in enumerate(zip(c_embs, c_nrms), start=1):
            d = _np_dissim_ppm(e, nr, ce, cn)
            if best_d is None:
                best_d = d
                best_s = np.full(n, i, dtype=np.int32)
            else:
                upd = d < best_d  # strict: ties keep the earliest step
                best_d = np.where(upd, d, best_d)
                best_s = np.where(upd, np.int32(i), best_s)
        return pd.DataFrame({"d": best_d, "step": best_s})

    return scorer


def kcenter_from(
    e: DataFrame, k: int, stats: list | None = None
) -> DataFrame:
    """The greedy loop from a projected (vec_id, emb, nrm) frame —
    shared by the registered query above and the scale rehearsal
    (tools/scale_rehearsal_kcenter.py), which feeds synthetic corpora
    and collects per-step wall times through ``stats``.

    Lazy-greedy buffer discipline (r11, replacing the r10
    one-TakeOrdered-job-per-center loop whose K-1 driver round trips
    of plan construction + job scheduling dominated the wall): ONE
    TakeOrdered(J) collects the J farthest remaining rows under the
    current center chain. Every non-collected row's running
    min-dissim was <= the J-th collected value at fill time and can
    only SHRINK as centers are added (least of a superset), so while
    the buffer's best updated value is STRICTLY ABOVE that bound it is
    provably the global (d desc, vec_id asc) argmax. Equality does NOT
    certify (r11 review fix): an outside row can sit exactly at the
    bound with a SMALLER vec_id than a buffer row that shrank down to
    the bound from above — the at-fill tie ordering only covers rows
    that were AT the bound when collected — so a best value equal to
    the bound triggers a refill like any failure. Certified steps run
    entirely on the driver with ``_np_dissim_ppm`` (bit-equal
    arithmetic); a failed certificate
    triggers one distributed refill under the full chain. The census
    is one stateless pass: the same incremental least((d, step))
    chain over all K centers as literals — value-identical to the r10
    per-step state fold (same expression, same struct-least ties) —
    plus the K driver-side own-assignment rows. Total jobs: seed +
    initial fill + census + refills (zero at every tested SF), versus
    K+2 before; no corpus-sized persists remain (the base persist
    covers the 2-4 full passes) and nothing outlives the call."""
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

    import numpy as np

    # buffer size: larger J strengthens the certificate (the bound is
    # the J-th collected value) at ~600 B/row of driver memory, and a
    # TakeOrdered(2048) costs the same one job as TakeOrdered(1); the
    # driver-side updates are the vectorized K×J×dim multiply-adds of
    # _np_dissim_ppm, microseconds at this size. J=64 paid two refill
    # jobs at sf0.1 and J=512 one; 2048 certified every tested SF
    # refill-free. (_BUFFER_J is module state so the refill-path test
    # can shrink it and prove the trajectory is J-invariant.)
    j_cap = max(_BUFFER_J, 2 * k)

    def _refill():
        """One TakeOrdered(J) job: the J remaining rows farthest from
        the current center chain, with their (d, step) running min.
        Returns (buffer, bound); bound None means the buffer holds
        EVERY remaining row (certificate always passes)."""
        sel = [int(c.vec_id) for c, _ in centers]
        rows = (
            base.filter(~F.col("vec_id").isin(sel))
            .select(
                "vec_id", "emb", "nrm",
                _nearest_pdf(centers)(F.col("emb"), F.col("nrm")).alias("m"),
            )
            .orderBy(F.desc("m.d"), F.asc("vec_id"))
            .limit(j_cap)
            .collect()
        )
        if not rows:
            return None, None
        buf = {
            "vid": np.array([int(r.vec_id) for r in rows], dtype=np.int64),
            "emb": np.array([list(r.emb) for r in rows], dtype=np.float64),
            "nrm": np.array([float(r.nrm) for r in rows], dtype=np.float64),
            "d": np.array([int(r.m["d"]) for r in rows], dtype=np.int64),
            "s": np.array([int(r.m["step"]) for r in rows], dtype=np.int32),
        }
        return buf, (int(buf["d"][-1]) if len(rows) == j_cap else None)

    def _best(buf):
        """Index of the buffer's (d desc, vec_id asc) argmax."""
        if buf is None or len(buf["vid"]) == 0:
            return None
        return int(np.lexsort((buf["vid"], -buf["d"]))[0])

    # own-assignment step per selected center (driver-side, K bounded):
    # seed is assigned to itself
    own_steps = [1]
    _t0 = _time.time()
    buf, bound = _refill()
    # the initial fill is step 2's distributed work — fold its wall
    # into step 2's stats entry below so callers get exactly one
    # sample per step (the double (2, …) entry skewed the rehearsal's
    # per-step means; r11 review fix)
    _fill_s = _time.time() - _t0
    for step in range(2, k + 1):
        _t0 = _time.time() - (_fill_s if step == 2 else 0.0)
        idx = _best(buf)
        if idx is None or (bound is not None and int(buf["d"][idx]) <= bound):
            # certificate failed (or buffer drained): one distributed
            # refill under the full chain re-establishes the bound.
            # <= is load-bearing: only a value STRICTLY above the bound
            # beats every outside row on the (d desc, vec_id asc)
            # order — at equality an outside row with a smaller vec_id
            # may be the true argmax (r11 review fix; pinned by
            # test_kcenter_tie_at_bound_refills)
            buf, bound = _refill()
            idx = _best(buf)
        if idx is None:
            if stats is not None:
                stats.append((step, _time.time() - _t0))
            break  # corpus smaller than K: trajectory ends gracefully
        c_emb = buf["emb"][idx]
        c_nrm = float(buf["nrm"][idx])
        c_d = int(buf["d"][idx])
        c_step = int(buf["s"][idx])
        centers.append((_BufCenter(int(buf["vid"][idx]), c_emb.tolist(),
                                   c_nrm), c_d))
        # the center's own census slot replicates the argmin over ALL
        # centers: its self-dissimilarity is 0 for a real vector but
        # the NULL-cosine SENTINEL distance for a zero-norm one
        # (dissim(c, c) rides the same try_divide → sentinel path);
        # an earlier center at d <= self_d claims it (struct-least
        # ties go to the earlier step), else it assigns to itself.
        self_d = 0 if c_nrm > 0.0 else 1_000_000 - _SENT_PPM
        own_steps.append(c_step if c_d <= self_d else step)
        keep = np.ones(len(buf["vid"]), dtype=bool)
        keep[idx] = False
        buf = {key: a[keep] for key, a in buf.items()}
        if len(buf["vid"]):
            d_new = _np_dissim_ppm(buf["emb"], buf["nrm"], c_emb, c_nrm)
            upd = d_new < buf["d"]  # strict: ties keep the earlier step
            buf["d"] = np.where(upd, d_new, buf["d"])
            buf["s"] = np.where(upd, np.int32(step), buf["s"])
        if stats is not None:
            stats.append((step, _time.time() - _t0))
    # census: ONE stateless pass — the vectorized nearest-center scorer
    # (value-identical to the r10 per-step struct-least fold), K-group
    # map-side-combined count
    sel = [int(c.vec_id) for c, _ in centers]
    census = {
        r.step: int(r.n_assigned)
        for r in base.filter(~F.col("vec_id").isin(sel))
        .select(_nearest_pdf(centers)(F.col("emb"), F.col("nrm")).alias("m"))
        .groupBy(F.col("m.step").alias("step"))
        .agg(F.count(F.lit(1)).alias("n_assigned"))
        .collect()
    }
    for s in own_steps:
        census[s] = census.get(s, 0) + 1
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
