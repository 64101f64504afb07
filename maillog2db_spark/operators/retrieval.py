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
(operators/text.bm25_from_tf); the dense side is the shared cosine
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

from .. import io
from .dedup import _TOKENS_DUCK, _TOKENS_SPARK
from .similarity import _DOT_DUCK, _embeddings, cosine_topk, knn_queries_corpus
from .text import _BM25_1MB, _BM25_K1P1, BM25_B, BM25_K1, bm25_from_tf

HYBRID_N_QUERIES = 5  # doc_id/vec_id < N act as queries on both sides
HYBRID_TOP_K = 5      # per-system depth AND fused output depth
RRF_KAPPA = 60        # Cormack et al.'s constant; bounds any one rank's sway


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused (query_id, doc_id, rrf_ppm, rank_lex, rank_den, rank):
    per query, the top-k docs by summed reciprocal-rank contributions
    from the BM25 top-k and the exact-cosine top-k. rank_lex/rank_den
    are 0 when that system did not retrieve the doc (its RRF
    contribution is then 0 — standard RRF scores only retrieved
    ranks)."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    toks = d.select("doc_id", F.explode(F.expr(_TOKENS_SPARK)).alias("term"))
    ctf = (
        toks.filter(F.col("doc_id") >= HYBRID_N_QUERIES)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qterms = (
        toks.filter(F.col("doc_id") < HYBRID_N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    lex = bm25_from_tf(ctf, qterms, top_k=HYBRID_TOP_K).select(
        "query_id", "doc_id", F.col("rank").alias("rank_lex")
    )

    q, c = knn_queries_corpus(_embeddings(spark, sf_dir), HYBRID_N_QUERIES)
    den = cosine_topk(q, c, HYBRID_TOP_K).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rank_den"),
    )

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
    # bounded window: ≤ 2·HYBRID_TOP_K candidates per query by
    # construction (union of two top-k lists)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= HYBRID_TOP_K)
        .select("query_id", "doc_id", "rrf_ppm", "rank_lex", "rank_den", "rank")
    )


HYBRID_RRF_TOPK_SQL = f"""
WITH toks AS (
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
)
SELECT query_id, doc_id, rrf_ppm, rank_lex, rank_den, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_ppm DESC, doc_id) AS rank
  FROM rrf
) WHERE rank <= {HYBRID_TOP_K}
"""
