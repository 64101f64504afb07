"""Serving-path hybrid search: one ad-hoc (text, vector) query against
the ACCUMULATED streaming stores — the streaming inverted index
(streaming_bm25.PostingsStore, term-bucket partition-pruned) on the
lexical side and the persisted IVFADC index (similarity.
build_ivfpq_index, probe-cell partition-pruned) on the dense side —
fused by the SAME exact-integer RRF core the batch query uses
(operators/retrieval.rrf_fuse). This is the deployment shape of
doc_hybrid_rrf_topk: neither side rescans its corpus; both prune their
store reads to the query's buckets/cells, so serving cost is bounded
by posting-list + probed-cell volume, independent of accumulated
corpus size.

No reimplemented scoring anywhere: lexical scores ride
streaming_bm25.search (pruning ≡ unpruned, tested), dense ranks ride
query_ivfpq_index (≡ inline IVFADC, tested), fusion rides rrf_fuse
(hash-verified through doc_hybrid_rrf_topk). The test certifies the
composition against a from-parts RRF computed independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.retrieval import HYBRID_TOP_K, rrf_fuse
from .operators.similarity import TOP_K as _ANN_TOP_K
from .operators.similarity import query_ivfpq_index
from .streaming_bm25 import PostingsStore, search


def hybrid_search(
    spark: SparkSession,
    postings: PostingsStore,
    index_dir: str,
    text: str,
    q_emb: list[float],
    k: int = HYBRID_TOP_K,
) -> DataFrame:
    """Fused top-k for one ad-hoc query: ``text`` probes the streaming
    inverted index, ``q_emb`` probes the persisted IVFADC index, and
    the two rank lists fuse through the shared RRF core. Returns
    (query_id=-1, doc_id, rrf_ppm, rank_lex, rank_den, rank)."""
    if k > _ANN_TOP_K:
        raise ValueError(
            f"k={k} exceeds the ANN index depth TOP_K={_ANN_TOP_K}"
        )
    lex = search(spark, postings, text, k=k).select(
        F.lit(-1).cast("bigint").alias("query_id"),
        "doc_id",
        F.col("rank").alias("rank_lex"),
    )
    qdf = spark.createDataFrame(
        [(-1, [float(x) for x in q_emb])],
        "query_id bigint, q_emb array<float>",
    )
    den = (
        query_ivfpq_index(spark, index_dir, qdf)
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("rank_den"),
        )
    )
    return rrf_fuse(lex, den, k)
