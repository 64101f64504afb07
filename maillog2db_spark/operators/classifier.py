"""Domain-discriminator quality classifier over ``documents`` — the
CCNet/GPT-3-style model-based quality filter: train a logistic
regression to separate a high-quality reference slice (the benchmark
source, as in decontam) from the rest of the corpus, then score every
document. (Wenzek et al. 2020 §4.3 trains exactly this shape — a
linear classifier over cheap features with the curated corpus as the
positive class; the reference repo has no analytics surface at all,
maillog2db.go:180-280 is pure ingest.)

Why this is hash-verifiable cross-engine when "training a model" is
normally float soup:

  * Rational sigmoid. ``σ(z) ≈ 0.5 + z / (2·(1+|z|))`` — the "fast
    sigmoid" — uses only +, ×, ÷, abs: IEEE-deterministic on both
    engines, unlike exp(), whose libm implementations may differ in
    the last ulp and flip a rounding boundary.
  * Integer features. Every feature quantizes to ppm BIGINT at birth
    (length cap, token-count cap, mean-token-length cap), so the dot
    product is exact integer arithmetic; the only doubles are the
    sigmoid's, computed from identical integers on both engines.
  * Integer gradients. Each row's gradient contribution rounds to a
    ppb BIGINT before the cross-row SUM — bigint sums are order-free,
    so partition count, AQE, and reduction order cannot move the hash.
  * Integer weights. The update divides the gradient sum by 2n with
    TRUNCATING integer division (Spark ``div``, DuckDB ``//``, and a
    matching trunc in the driver loop — all three round toward zero),
    so the weight vector after every iteration is the same exact
    BIGINT triple everywhere.

Scale design: features are one codegen'd map over the corpus,
checkpointed once; each GD iteration is ONE map-side-combined
aggregate over that 5-int-column table returning a single row to the
driver (bounded: 4 longs/iteration); the weights ride back as
literals — no join of any kind in the loop. CLS_ITERS corpus scans
total, embarrassingly parallel, zero shuffles beyond the aggregates'
single-row combines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from .decontam import BENCH_SOURCE

CLS_ITERS = 3  # GD iterations, unrolled in the oracle SQL
_N_FEAT = 4  # bias + 3 quantized features

# Spark-side feature exprs (ppm BIGINTs). Kept in lockstep with the
# DuckDB twins below — widen BEFORE multiplying (length×1e6 overflows
# 32-bit int).
_NTOK = "size(filter(split(text, ' '), t -> t != ''))"
_X_SPARK = [
    "CAST(1000000 AS BIGINT)",
    "least(CAST(length(text) AS BIGINT), 4000) * 1000000 div 4000",
    f"least(CAST({_NTOK} AS BIGINT), 600) * 1000000 div 600",
    f"least((CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000000)"
    f" div (greatest(CAST({_NTOK} AS BIGINT), 1) * 12), 1000000)",
]

_NTOK_DUCK = "len(list_filter(string_split(text, ' '), t -> t != ''))"
_X_DUCK = [
    "CAST(1000000 AS BIGINT)",
    "least(CAST(length(text) AS BIGINT), 4000) * 1000000 // 4000",
    f"least(CAST({_NTOK_DUCK} AS BIGINT), 600) * 1000000 // 600",
    f"least((CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000000)"
    f" // (greatest(CAST({_NTOK_DUCK} AS BIGINT), 1) * 12), 1000000)",
]


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = io.load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cols = [F.expr(x).cast("bigint").alias(f"x{j}") for j, x in enumerate(_X_SPARK)]
    return d.select(
        "doc_id",
        "source",
        F.when(F.col("source") == BENCH_SOURCE, 1).otherwise(0).cast("int").alias("y"),
        *cols,
    )


def _sigmoid_expr(w: list[int]) -> str:
    """Rational sigmoid of the ppb-weight · ppm-feature dot product —
    z is an exact BIGINT in 1e-15 units before the single cast."""
    z = " + ".join(f"({w[j]} * x{j})" for j in range(_N_FEAT))
    zd = f"(CAST({z} AS DOUBLE) / 1e15)"
    return f"(0.5 + {zd} / (2 * (1 + abs({zd}))))"


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark ``div`` and
    DuckDB ``//`` semantics, which Python ``//`` (floor) is NOT."""
    q, r = divmod(a, b)
    return q + 1 if (r != 0 and (a < 0) != (b < 0)) else q


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train CLS_ITERS batch-GD iterations (lr = 0.5) and score every
    document: (doc_id, source, lr_score_ppm, bench_like)."""
    # eager, deliberately (r10 A/B): the lazy form measured 2-3x
    # slower in-suite ([1.80, 1.65] vs [1.17, 0.66] s both-runs) —
    # materializing inside the first GD aggregate loses to a dedicated
    # full-parallelism checkpoint job here
    feats = _features(spark, sf_dir).localCheckpoint(eager=True)
    n = feats.count()
    if n == 0:
        return spark.createDataFrame(
            [], "doc_id long, source string, lr_score_ppm long, bench_like boolean"
        )
    w = [0] * _N_FEAT
    for _ in range(CLS_ITERS):
        s = _sigmoid_expr(w)
        sums = feats.agg(
            *[
                F.sum(
                    F.expr(f"CAST(round(({s} - y) * x{j} * 1000) AS BIGINT)")
                ).alias(f"g{j}")
                for j in range(_N_FEAT)
            ]
        ).collect()[0]
        w = [w[j] - _tdiv(sums[f"g{j}"], 2 * n) for j in range(_N_FEAT)]
    s = _sigmoid_expr(w)
    return feats.select(
        "doc_id",
        "source",
        F.expr(f"CAST(round({s} * 1000000) AS BIGINT)").alias("lr_score_ppm"),
        F.expr(f"{s} >= 0.5").alias("bench_like"),
    )


def _duck_sigmoid(wcols: list[str]) -> str:
    z = " + ".join(f"({wc} * x{j})" for j, wc in enumerate(wcols))
    zd = f"(CAST({z} AS DOUBLE) / 1e15)"
    return f"(0.5 + {zd} / (2 * (1 + abs({zd}))))"


def _duck_grads(sig: str, src: str) -> str:
    return ", ".join(
        f"sum(CAST(round(({sig} - y) * x{j} * 1000) AS BIGINT)) AS g{j}"
        for j in range(_N_FEAT)
    )


def _duck_update(wcols: list[str], gsrc: str) -> str:
    return ", ".join(
        f"CAST({wc} - (CASE WHEN {gsrc}.g{j} >= 0 THEN {gsrc}.g{j} // (2 * nn.n)"
        f" ELSE -((-{gsrc}.g{j}) // (2 * nn.n)) END) AS BIGINT) AS w{j}"
        for j, wc in enumerate(wcols)
    )


_W0 = ["CAST(0 AS BIGINT)"] * _N_FEAT
_S1 = _duck_sigmoid(_W0)  # z = 0 → exactly 0.5, no float path at all
_S2 = _duck_sigmoid([f"w1.w{j}" for j in range(_N_FEAT)])
_S3 = _duck_sigmoid([f"w2.w{j}" for j in range(_N_FEAT)])
_SF = _duck_sigmoid([f"w3.w{j}" for j in range(_N_FEAT)])

QUALITY_CLASSIFIER_SQL = f"""
WITH feat AS (
  SELECT doc_id, source,
         CASE WHEN source = '{BENCH_SOURCE}' THEN 1 ELSE 0 END AS y,
         {", ".join(f"CAST({x} AS BIGINT) AS x{j}" for j, x in enumerate(_X_DUCK))}
  FROM documents WHERE text IS NOT NULL
), nn AS (SELECT count(*) AS n FROM feat),
g1 AS (SELECT {_duck_grads(_S1, "feat")} FROM feat),
w1 AS (SELECT {_duck_update(_W0, "g1")} FROM g1 CROSS JOIN nn),
g2 AS (SELECT {_duck_grads(_S2, "feat")} FROM feat CROSS JOIN w1),
w2 AS (SELECT {_duck_update([f"w1.w{j}" for j in range(_N_FEAT)], "g2")}
       FROM g2 CROSS JOIN w1 CROSS JOIN nn),
g3 AS (SELECT {_duck_grads(_S3, "feat")} FROM feat CROSS JOIN w2),
w3 AS (SELECT {_duck_update([f"w2.w{j}" for j in range(_N_FEAT)], "g3")}
       FROM g3 CROSS JOIN w2 CROSS JOIN nn)
SELECT doc_id, source,
       CAST(round({_SF} * 1000000) AS BIGINT) AS lr_score_ppm,
       ({_SF} >= 0.5) AS bench_like
FROM feat CROSS JOIN w3
"""
