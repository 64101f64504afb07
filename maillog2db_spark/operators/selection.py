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

Scale shape (the reason greedy k-center is THE distributed coreset
algorithm): per step, ONE narrow map over the corpus (update each
point's running min-dissim against the single new center — a 1-row
broadcast, no shuffle) and ONE TakeOrdered(1) (map-side top-1 per
partition, driver merges #partitions candidates). K steps = K scans,
zero wide shuffles in the loop; state is one extra bigint column
updated in place, lineage cut per step. The assignment census at the
end is one K-row broadcast join + a map-side-combined argmin. Nothing
is ever pairwise in the corpus: O(K·N) total work, exactly the
published bound, and the 2-approximation guarantee of the greedy
traversal comes with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _DOT_DUCK, _dot, _embeddings, _norm

KCENTER_K = 8  # unrolled in the oracle SQL; keep the two in sync
_SENT_PPM = -2_000_000  # below any real cosine ppm; NULL-cosine sentinel


def _dissim_ppm(a_emb, b_emb, ab_nrm):
    """Exact-ppm dissimilarity 1e6 - cos_ppm from the 6dp-rounded
    cosine (the knn contract's bit-identical double); NULL cosine
    (zero-norm side) floors to the sentinel -> maximally far."""
    cos_ppm = F.coalesce(
        F.floor(
            F.round(F.try_divide(_dot(a_emb, b_emb), ab_nrm), 6) * 1_000_000
            + F.lit(0.5)
        ),
        F.lit(_SENT_PPM),
    )
    return (F.lit(1_000_000) - cos_ppm).cast("bigint")


def kcenter_select(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Greedy k-center over the full embedding corpus; returns one row
    per selected center: (step, center_id, radius_ppm, n_assigned).

    radius_ppm at step s is the max-min-dissimilarity that step's
    center was chosen at (the coverage radius the corpus had BEFORE the
    center joined; step 1 seeds at the lowest vec_id with radius 0).
    n_assigned is the final census: each corpus vector assigned to its
    nearest center (ties to the earliest step).
    """
    e = _embeddings(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").alias("emb"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    # step 1: deterministic seed at the lowest vec_id (1 bounded row)
    seed = e.orderBy(F.asc("vec_id")).limit(1).localCheckpoint(eager=True)
    centers = seed.select(
        F.lit(1).cast("int").alias("step"),
        F.col("vec_id").alias("center_id"),
        F.col("emb").alias("ct_emb"),
        F.col("nrm").alias("ct_nrm"),
        F.lit(0).cast("bigint").alias("radius_ppm"),
    ).localCheckpoint(eager=True)
    cd = seed.select(
        F.col("vec_id").alias("c_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    state = (
        e.crossJoin(F.broadcast(cd))
        .filter(F.col("vec_id") != F.col("c_id"))
        .select(
            "vec_id",
            "emb",
            "nrm",
            _dissim_ppm(
                F.col("emb"), F.col("c_emb"), F.col("nrm") * F.col("c_nrm")
            ).alias("mind_ppm"),
        )
        .localCheckpoint(eager=False)
    )
    for step in range(2, k + 1):
        # farthest remaining point: TakeOrdered(1) — map-side top-1 per
        # partition, never a global sort shuffle
        nxt = (
            state.orderBy(F.desc("mind_ppm"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        centers = centers.unionByName(
            nxt.select(
                F.lit(step).cast("int").alias("step"),
                F.col("vec_id").alias("center_id"),
                F.col("emb").alias("ct_emb"),
                F.col("nrm").alias("ct_nrm"),
                F.col("mind_ppm").alias("radius_ppm"),
            )
        ).localCheckpoint(eager=True)
        if step < k:
            cd = nxt.select(
                F.col("vec_id").alias("c_id"),
                F.col("emb").alias("c_emb"),
                F.col("nrm").alias("c_nrm"),
            )
            state = (
                state.crossJoin(F.broadcast(cd))
                .filter(F.col("vec_id") != F.col("c_id"))
                .select(
                    "vec_id",
                    "emb",
                    "nrm",
                    F.least(
                        F.col("mind_ppm"),
                        _dissim_ppm(
                            F.col("emb"),
                            F.col("c_emb"),
                            F.col("nrm") * F.col("c_nrm"),
                        ),
                    ).alias("mind_ppm"),
                )
                .localCheckpoint(eager=False)
            )
    # assignment census: K-row broadcast, map-side-combined argmin
    # (min of (dissim, step) struct = nearest center, ties to the
    # earliest step; a center assigns to itself at dissim 0)
    assigned = (
        e.crossJoin(F.broadcast(centers))
        .select(
            "vec_id",
            F.struct(
                _dissim_ppm(
                    F.col("emb"), F.col("ct_emb"), F.col("nrm") * F.col("ct_nrm")
                ).alias("d"),
                F.col("step").alias("step"),
            ).alias("ds"),
        )
        .groupBy("vec_id")
        .agg(F.min("ds").alias("m"))
        .groupBy(F.col("m.step").alias("step"))
        .agg(F.count(F.lit(1)).alias("n_assigned"))
    )
    return centers.select("step", "center_id", "radius_ppm").join(
        assigned, "step"
    ).select("step", "center_id", "radius_ppm", "n_assigned")


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: greedy k-center coreset of KCENTER_K centers
    over the whole embedding table, with the selection trajectory
    (coverage radius per step) and the final assignment census."""
    return kcenter_select(spark, sf_dir, KCENTER_K)


def _kcenter_oracle_sql() -> str:
    """Unrolled-CTE oracle: re-derives every greedy step independently
    (the MMR pattern), then the assignment census — the gate certifies
    the full trajectory, not one step."""
    dis = (
        "CAST(1000000 - coalesce(floor(round("
        + _DOT_DUCK.format(a="{a}", b="{b}")
        + " / ({na} * {nb}), 6) * 1000000 + 0.5), "
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
