"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
dense (cosine ANN) rankings — the standard first-stage retriever shape
in RAG and training-data curation pipelines (Cormack, Clarke &
Büttcher, SIGIR 2009: RRF "outperforms … any individual system" with a
single constant κ). The engine already owns both rankers; this module
composes them WITHOUT new scoring machinery, so the fusion inherits
each side's verified determinism.

Query/corpus protocol: doc_id < HYBRID_N_QUERIES act as queries on
BOTH sides (the testdata layout pairs embeddings with documents,
vec_id = doc_id — the same convention as embed_semdedup_keep_best and
doc_quality-weighted dedup). The lexical side is the shared BM25 core
(operators/text.bm25_rankings — the dl-carry batch core); the dense side is the shared cosine
top-k core (operators/similarity.cosine_topk) — identical expression
trees to the standalone queries, so a hash-green hybrid binds both.

Determinism: RRF is rank arithmetic — contribution = 1e6 div (κ +
rank) in EXACT integers (truncating div on non-negative operands is
identical in Spark `div` and DuckDB `//`), summed per (query, doc).
No floats cross the fusion at all; ties break on doc_id.

Plan shape at scale: each side ends in its own two-phase top-k, so the
fusion's full-outer join sees ≤ 2·k rows per query — bounded, never
data-proportional. The per-query final window runs over ≤ 2·k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _TOKENS_DUCK
from .similarity import (
    _DOT_DUCK,
    _dot,
    _embeddings,
    EXACT_RANK_DEPTH,
    cosine_topk,
    knn_queries_corpus,
)
from .text import _BM25_1MB, _BM25_K1P1, BM25_B, BM25_K1

HYBRID_N_QUERIES = 5  # doc_id/vec_id < N act as queries on both sides
HYBRID_TOP_K = 5      # per-system depth AND fused output depth
RRF_KAPPA = 60        # Cormack et al.'s constant; bounds any one rank's sway


def _hybrid_rankings(spark: SparkSession, sf_dir: str):
    """The two per-query ranked lists both the fusion and the
    label-relevance eval consume: (lex, den) with columns
    (query_id, doc_id, rank_lex) / (query_id, doc_id, rank_den) —
    identical expression trees to the standalone rankers. Both are
    bounded top-k lists (queries × k rows), session-cached so the two
    registered consumers run the BM25 probe and the dense scan once
    per (session, sf_dir)."""
    from .dedup import _cached

    lex = _cached(
        spark, sf_dir, "hyb_lex",
        lambda: _hybrid_lex(spark, sf_dir),
    )
    den = _cached(
        spark, sf_dir, "hyb_den",
        lambda: _hybrid_den(spark, sf_dir),
    )
    return lex, den


def _hybrid_lex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import bm25_rankings

    return bm25_rankings(
        spark, sf_dir, HYBRID_N_QUERIES, HYBRID_TOP_K
    ).select("query_id", "doc_id", F.col("rank").alias("rank_lex"))


def _hybrid_den(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10: filter of the shared session-cached exact ranking (depth-k
    # prefix of a deeper two-phase rank is exact; see
    # similarity.exact_cosine_ranking)
    from .similarity import exact_cosine_ranking

    return exact_cosine_ranking(spark, sf_dir).filter(
        F.col("rank") <= HYBRID_TOP_K
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rank_den"),
    )


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused (query_id, doc_id, rrf_ppm, rank_lex, rank_den, rank):
    per query, the top-k docs by summed reciprocal-rank contributions
    from the BM25 top-k and the exact-cosine top-k. rank_lex/rank_den
    are 0 when that system did not retrieve the doc (its RRF
    contribution is then 0 — standard RRF scores only retrieved
    ranks)."""
    lex, den = _hybrid_rankings(spark, sf_dir)
    return rrf_fuse(lex, den, HYBRID_TOP_K)


def rrf_fuse(lex: DataFrame, den: DataFrame, top_k: int) -> DataFrame:
    """The fusion core: two (query_id, doc_id, rank_lex/rank_den)
    ranked lists → fused top-k. Shared by the batch query above and
    the streaming serving path (streaming_hybrid.py), so serving
    fusion is the SAME expression, not a reimplementation."""
    fused = (
        lex.join(den, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).cast("int").alias("rank_lex"),
            F.coalesce("rank_den", F.lit(0)).cast("int").alias("rank_den"),
        )
        .withColumn(
            "rrf_ppm",
            F.expr(
                f"CAST((CASE WHEN rank_lex > 0"
                f"  THEN 1000000 div ({RRF_KAPPA} + rank_lex) ELSE 0 END)"
                f" + (CASE WHEN rank_den > 0"
                f"  THEN 1000000 div ({RRF_KAPPA} + rank_den) ELSE 0 END)"
                " AS BIGINT)"
            ),
        )
    )
    # bounded window: ≤ 2·top_k candidates per query by construction
    # (union of two top-k lists)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rrf_ppm", "rank_lex", "rank_den", "rank")
    )


# CTE prefix shared by the fusion query and the label-relevance eval
_HYBRID_CTES = f"""toks AS (
  SELECT doc_id, unnest({_TOKENS_DUCK}) AS term FROM documents
), ctf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE doc_id >= {HYBRID_N_QUERIES} GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks
  WHERE doc_id >= {HYBRID_N_QUERIES} GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
), dfreq AS (
  SELECT term, count(*) AS df FROM ctf GROUP BY 1
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, term FROM toks
  WHERE doc_id < {HYBRID_N_QUERIES}
), contrib AS (
  SELECT q.query_id, c.doc_id,
         CAST(floor(
           ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * ((tf * {_BM25_K1P1!r}) / (tf + {BM25_K1!r}
              * ({_BM25_1MB!r} + {BM25_B!r} * (dl / avgdl))))
           * 1000000 + 0.5) AS BIGINT) AS c_upm
  FROM ctf c
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  JOIN qterms q USING (term)
  CROSS JOIN stats
), lex_scored AS (
  SELECT query_id, doc_id, CAST(sum(c_upm) AS BIGINT) AS bm25_ppm
  FROM contrib GROUP BY 1, 2
), lex AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25_ppm DESC, doc_id) AS rank
    FROM lex_scored
  ) WHERE rank <= {HYBRID_TOP_K}
), qv AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {HYBRID_N_QUERIES}
), cv AS (
  SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings
  WHERE vec_id >= {HYBRID_N_QUERIES}
), den_scored AS (
  SELECT query_id, neighbor_id,
         round({_DOT_DUCK.format(a='q_emb', b='c_emb')}
               / (sqrt({_DOT_DUCK.format(a='q_emb', b='q_emb')})
                  * sqrt({_DOT_DUCK.format(a='c_emb', b='c_emb')})), 6) AS cosine
  FROM cv CROSS JOIN qv
), den AS (
  SELECT query_id, neighbor_id AS doc_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC NULLS LAST, neighbor_id) AS rank
    FROM den_scored
  ) WHERE rank <= {HYBRID_TOP_K}
), fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(coalesce(l.rank, 0) AS INT) AS rank_lex,
         CAST(coalesce(d.rank, 0) AS INT) AS rank_den
  FROM lex l FULL JOIN den d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
), rrf AS (
  SELECT query_id, doc_id, rank_lex, rank_den,
         CAST((CASE WHEN rank_lex > 0
                 THEN 1000000 // ({RRF_KAPPA} + rank_lex) ELSE 0 END)
            + (CASE WHEN rank_den > 0
                 THEN 1000000 // ({RRF_KAPPA} + rank_den) ELSE 0 END)
              AS BIGINT) AS rrf_ppm
  FROM fused
)"""

HYBRID_RRF_TOPK_SQL = f"""
WITH {_HYBRID_CTES}
SELECT query_id, doc_id, rrf_ppm, rank_lex, rank_den, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_ppm DESC, doc_id) AS rank
  FROM rrf
) WHERE rank <= {HYBRID_TOP_K}
"""


# --- MMR diversified rerank --------------------------------------------------

MMR_POOL = 10         # relevance pool depth fed to the greedy selector
MMR_K = 5             # selections per query

# the MMR pool and the hybrid dense leg are prefixes of the shared
# session-cached exact ranking — raising either past its depth would
# silently truncate the candidate pools (ADVICE r10); fail at import
assert MMR_POOL <= EXACT_RANK_DEPTH and HYBRID_TOP_K <= EXACT_RANK_DEPTH, (
    "exact_cosine_ranking depth must cover every prefix consumer: "
    f"MMR_POOL={MMR_POOL}, HYBRID_TOP_K={HYBRID_TOP_K} > {EXACT_RANK_DEPTH}"
)
MMR_SENTINEL_PPM = -2_000_000  # below any real cosine ppm (range ±1e6):
# zero-norm vectors have NULL cosine; the sentinel makes them sort last
# and keeps every score an exact bigint (no NULL arithmetic divergence)


def _cos_ppm(col):
    """6dp-rounded cosine → exact ppm bigint; NULL → sentinel. The
    6dp double is bit-identical cross-engine (knn contract), so
    floor(c·1e6 + 0.5) recovers the same integer on both sides."""
    return F.coalesce(
        F.floor(col * 1_000_000 + F.lit(0.5)),
        F.lit(MMR_SENTINEL_PPM),
    ).cast("bigint")


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    1998): greedily pick MMR_K of the MMR_POOL most-relevant corpus
    vectors per query, each step maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`` with λ = 0.7 —
    the standard diversity pass after first-stage retrieval (and the
    diversity-aware sampling shape for near-dup-heavy corpora).

    Determinism: both rel and pairwise sim are the knn contract's
    6dp cosines lifted to exact ppm integers (NULL → sentinel), so the
    greedy trajectory is integer arithmetic end-to-end:
    ``score = 7·rel_ppm − 3·ms_ppm`` (λ = 0.7 as exact ×10 weights);
    ties break on doc_id. The oracle unrolls the same K steps as CTEs
    (the BPE-trainer pattern).

    Plan shape at scale: the pool rides the two-phase cosine top-k
    (bounded MMR_POOL rows/query); the pairwise sim table is
    ≤ POOL²/query (bounded); both are localCheckpoint'd ONCE (bounded
    metadata, like the kmeans centroid trajectory) so the K−1 greedy
    iterations — per-query windows over ≤ POOL rows — never re-derive
    the corpus scan. Everything after the pool is independent of
    corpus size and partitioned by query_id."""
    from .similarity import embeddings_with_nrm, exact_cosine_ranking

    e = embeddings_with_nrm(spark, sf_dir)
    q, c = knn_queries_corpus(e, HYBRID_N_QUERIES)
    # r10: the pool is the shared session-cached exact ranking
    # (EXACT_RANK_DEPTH == MMR_POOL); the corpus scan no longer
    # re-runs per call
    pool = exact_cosine_ranking(spark, sf_dir).filter(
        F.col("rank") <= MMR_POOL
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        _cos_ppm(F.col("cosine")).alias("rel_ppm"),
    )
    cv = c.select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("c_emb"),
        F.col("c_nrm"),
    )
    # lazy (r10): bounded POOL-grain tables — the caller's action
    # materializes them on first touch; eager forms paid two dedicated
    # driver jobs per call before any result row was computed
    poolv = pool.join(cv, "doc_id").localCheckpoint(eager=False)
    x, y = poolv.alias("x"), poolv.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.query_id") == F.col("y.query_id"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.col("x.query_id").alias("query_id"),
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            _cos_ppm(
                F.round(
                    F.try_divide(
                        _dot(F.col("x.c_emb"), F.col("y.c_emb")),
                        F.col("x.c_nrm") * F.col("y.c_nrm"),
                    ),
                    6,
                )
            ).alias("sim_ppm"),
        )
    )

    # r11 job-count attack (the kcenter pattern): everything after the
    # pool is CONSTANT-bounded metadata — N_QUERIES·POOL pool rows and
    # ≤ N_QUERIES·POOL² sims, independent of corpus size — and every
    # score is a non-null bigint (_cos_ppm's sentinel), so the greedy
    # fold runs on the DRIVER over two bounded collects instead of
    # K−1 unrolled join+window+lazy-checkpoint rounds (per-step plan
    # construction + scheduling dominated the wall; the distributed
    # work — the cached exact ranking and the pairwise sim table — is
    # unchanged, and the sims are collected as Spark-computed integers,
    # never recomputed in Python). Semantics replicated verbatim:
    #   step 1   argmax rel_ppm, ties doc_id asc, ms = 0
    #   step s   argmax 7·rel − 3·ms (exact ints), ties doc_id asc
    #   update   ms' = max(ms, sim(d, selected)), selected removed;
    #   a query with an exhausted pool stops early (the row_number
    #   form produced no row for it), and the exact-integer max over
    #   non-null bigints is greatest().
    pool_rows = poolv.select("query_id", "doc_id", "rel_ppm").collect()
    sim = {(r.query_id, r.a, r.b): r.sim_ppm for r in pairs.collect()}
    by_q: dict = {}
    for r in pool_rows:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.rel_ppm))
    out = []
    for qid, docs in by_q.items():
        sel_doc, sel_rel = min(docs, key=lambda t: (-t[1], t[0]))
        out.append((qid, 1, sel_doc, sel_rel, 0, 7 * sel_rel))
        state = {
            d: (rel, sim[(qid, d, sel_doc)]) for d, rel in docs if d != sel_doc
        }
        for step in range(2, MMR_K + 1):
            if not state:
                break
            sel_doc, (sel_rel, sel_ms) = min(
                state.items(),
                key=lambda kv: (-(7 * kv[1][0] - 3 * kv[1][1]), kv[0]),
            )
            out.append(
                (qid, step, sel_doc, sel_rel, sel_ms, 7 * sel_rel - 3 * sel_ms)
            )
            del state[sel_doc]
            state = {
                d: (rel, max(ms, sim[(qid, d, sel_doc)]))
                for d, (rel, ms) in state.items()
            }
    pf = {f.name: f.dataType for f in poolv.schema.fields}
    schema = T.StructType(
        [
            T.StructField("query_id", pf["query_id"]),
            T.StructField("step", T.IntegerType()),
            T.StructField("doc_id", pf["doc_id"]),
            T.StructField("rel_ppm", T.LongType()),
            T.StructField("ms_ppm", T.LongType()),
            T.StructField("score_ppm", T.LongType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def _mmr_oracle_sql() -> str:
    """Unrolled-CTE oracle for the MMR greedy trajectory (the BPE
    trainer's pattern: the oracle re-derives every step independently,
    so the gate certifies the whole selection path, not one step)."""
    ppm = (
        "CAST(coalesce(floor({c} * 1000000 + 0.5), "
        f"{MMR_SENTINEL_PPM}) AS BIGINT)"
    )
    cos = (
        f"round({_DOT_DUCK.format(a='{a}', b='{b}')}"
        f" / (sqrt({_DOT_DUCK.format(a='{a}', b='{a}')})"
        f" * sqrt({_DOT_DUCK.format(a='{b}', b='{b}')})), 6)"
    )
    head = f"""WITH qv AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {HYBRID_N_QUERIES}
), cv AS (
  SELECT vec_id AS doc_id, embedding AS c_emb FROM embeddings
  WHERE vec_id >= {HYBRID_N_QUERIES}
), scored AS (
  SELECT query_id, doc_id,
         {cos.format(a='q_emb', b='c_emb')} AS cosine
  FROM cv CROSS JOIN qv
), pool AS (
  SELECT query_id, doc_id, {ppm.format(c='cosine')} AS rel_ppm FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC NULLS LAST, doc_id) AS rk
    FROM scored
  ) WHERE rk <= {MMR_POOL}
), poolv AS (
  SELECT p.query_id, p.doc_id, p.rel_ppm, cv.c_emb
  FROM pool p JOIN cv USING (doc_id)
), pairs AS (
  SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
         {ppm.format(c=cos.format(a='x.c_emb', b='y.c_emb'))} AS sim_ppm
  FROM poolv x JOIN poolv y
    ON x.query_id = y.query_id AND x.doc_id <> y.doc_id
), sel1 AS (
  SELECT query_id, 1 AS step, doc_id, rel_ppm,
         CAST(0 AS BIGINT) AS ms_ppm,
         CAST(7 * rel_ppm AS BIGINT) AS score_ppm
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_ppm DESC, doc_id) AS rn
    FROM pool
  ) WHERE rn = 1
), st1 AS (
  SELECT p.query_id, p.doc_id, p.rel_ppm, pr.sim_ppm AS ms_ppm
  FROM pool p
  JOIN sel1 s ON s.query_id = p.query_id AND p.doc_id <> s.doc_id
  JOIN pairs pr ON pr.query_id = p.query_id
               AND pr.a = p.doc_id AND pr.b = s.doc_id
)"""
    steps = []
    for n in range(2, MMR_K + 1):
        steps.append(f""", sel{n} AS (
  SELECT query_id, {n} AS step, doc_id, rel_ppm, ms_ppm, score_ppm
  FROM (
    SELECT *, CAST(7 * rel_ppm - 3 * ms_ppm AS BIGINT) AS score_ppm,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY 7 * rel_ppm - 3 * ms_ppm DESC,
                                       doc_id) AS rn
    FROM st{n - 1}
  ) WHERE rn = 1
)""")
        if n < MMR_K:
            steps.append(f""", st{n} AS (
  SELECT t.query_id, t.doc_id, t.rel_ppm,
         greatest(t.ms_ppm, pr.sim_ppm) AS ms_ppm
  FROM st{n - 1} t
  JOIN sel{n} s ON s.query_id = t.query_id AND t.doc_id <> s.doc_id
  JOIN pairs pr ON pr.query_id = t.query_id
               AND pr.a = t.doc_id AND pr.b = s.doc_id
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM sel{n}" for n in range(1, MMR_K + 1)
    )
    return (
        head
        + "".join(steps)
        + "\nSELECT query_id, CAST(step AS INT) AS step, doc_id,"
        + " rel_ppm, ms_ppm, score_ppm\nFROM (\n"
        + union
        + "\n)"
    )


MMR_RERANK_SQL = _mmr_oracle_sql()


def retrieval_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-relevance retrieval eval: MRR and precision@k for all
    THREE rankers (BM25 lexical, exact-cosine dense, RRF hybrid)
    against the same relevance signal — a retrieved doc is relevant
    iff its embedding label equals the query's label (the standard
    labeled-eval harness shape; at real scale the label column is a
    judgment set). One registered query hash-verifies the entire eval
    grid, the same contract as embed_ann_recall: the rankings, the
    relevance join, and the metric arithmetic all bind.

    Exact integers: rr_ppm = 1e6 div first-relevant-rank (0 when no
    relevant doc is retrieved), prec_at_k_ppm = n_rel·1e6 div k.
    Zero-filled over the full query × system grid, so a query whose
    BM25 side retrieved nothing still reports (0, 0, 0) for 'lex'
    instead of vanishing."""
    lex, den = _hybrid_rankings(spark, sf_dir)
    e = _embeddings(spark, sf_dir)
    lab = e.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("d_lab"))
    qlab = e.filter(F.col("vec_id") < HYBRID_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_lab")
    )
    return label_eval_grid(spark, lex, den, lab, qlab)


def label_eval_grid(
    spark: SparkSession,
    lex: DataFrame,
    den: DataFrame,
    lab: DataFrame,
    qlab: DataFrame,
) -> DataFrame:
    """The eval-grid core from pre-resolved rankings: lex (query_id,
    doc_id, rank_lex), den (query_id, doc_id, rank_den), a (doc_id,
    d_lab) label table and a (query_id, q_lab) query-label table.
    Split out of ``retrieval_label_eval`` so the streaming serving
    path (streaming_retrieval_eval.py) evaluates its store-resolved
    rankings through the IDENTICAL metric expression — ranking-quality
    drift at ingest time is the same hash-verified arithmetic, not a
    reimplementation."""
    hyb = rrf_fuse(lex, den, HYBRID_TOP_K)
    systems = (
        lex.select("query_id", "doc_id", F.col("rank_lex").alias("rank"),
                   F.lit("lex").alias("system"))
        .unionByName(
            den.select("query_id", "doc_id", F.col("rank_den").alias("rank"),
                       F.lit("dense").alias("system")))
        .unionByName(
            hyb.select("query_id", "doc_id", "rank",
                       F.lit("hybrid").alias("system")))
    )
    rel = (
        systems.join(lab, "doc_id")
        .join(F.broadcast(qlab), "query_id")
        .filter(F.col("d_lab") == F.col("q_lab"))
        .groupBy("system", "query_id")
        .agg(
            F.min("rank").alias("first_rel_rank"),
            F.count(F.lit(1)).alias("n_rel"),
        )
    )
    grid = qlab.select("query_id").crossJoin(
        spark.createDataFrame(
            [("lex",), ("dense",), ("hybrid",)], "system string"
        )
    )
    return (
        grid.join(rel, ["system", "query_id"], "left")
        .select(
            "system",
            "query_id",
            F.coalesce("first_rel_rank", F.lit(0)).cast("int")
            .alias("first_rel_rank"),
            F.expr(
                "CAST(CASE WHEN first_rel_rank IS NULL THEN 0 "
                "ELSE 1000000 div first_rel_rank END AS BIGINT)"
            ).alias("rr_ppm"),
            F.expr(
                f"CAST(coalesce(n_rel, 0) * 1000000 div {HYBRID_TOP_K} "
                "AS BIGINT)"
            ).alias("prec_at_k_ppm"),
        )
    )


RETRIEVAL_LABEL_EVAL_SQL = f"""
WITH {_HYBRID_CTES},
hyb AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf_ppm DESC, doc_id) AS rank
    FROM rrf
  ) WHERE rank <= {HYBRID_TOP_K}
),
systems AS (
  SELECT query_id, doc_id, rank AS rank, 'lex' AS system FROM lex
  UNION ALL
  SELECT query_id, doc_id, rank, 'dense' AS system FROM den
  UNION ALL
  SELECT query_id, doc_id, rank, 'hybrid' AS system FROM hyb
),
qlab AS (
  SELECT vec_id AS query_id, label AS q_lab FROM embeddings
  WHERE vec_id < {HYBRID_N_QUERIES}
),
rel AS (
  SELECT s.system, s.query_id,
         min(s.rank) AS first_rel_rank,
         CAST(count(*) AS BIGINT) AS n_rel
  FROM systems s
  JOIN embeddings d ON s.doc_id = d.vec_id
  JOIN qlab q ON s.query_id = q.query_id
  WHERE d.label = q.q_lab
  GROUP BY s.system, s.query_id
),
grid AS (
  SELECT query_id, system
  FROM qlab CROSS JOIN (VALUES ('lex'), ('dense'), ('hybrid')) sys(system)
)
SELECT g.system, g.query_id,
       CAST(coalesce(r.first_rel_rank, 0) AS INT) AS first_rel_rank,
       CAST(CASE WHEN r.first_rel_rank IS NULL THEN 0
            ELSE 1000000 // r.first_rel_rank END AS BIGINT) AS rr_ppm,
       CAST(coalesce(r.n_rel, 0) * 1000000 // {HYBRID_TOP_K} AS BIGINT)
         AS prec_at_k_ppm
FROM grid g LEFT JOIN rel r ON g.system = r.system AND g.query_id = r.query_id
"""
