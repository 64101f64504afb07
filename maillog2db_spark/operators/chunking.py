"""Corpus shaping for training: document chunking and sequence packing.

The two structural ops every LLM pretraining pipeline runs between "raw
corpus" and "token batches":

  * chunking — split each document into fixed-size overlapping windows
    (here 200 chars, stride 150). Expressed as sequence() + explode +
    substring: all codegen'd built-ins, no Python, and the explode's
    fan-out is data-parallel (each doc expands independently, so the
    operator scales by adding partitions — no shuffle at all).
  * packing — fill fixed token-budget bins (1024) with consecutive
    documents, PER LANGUAGE partition: a running-sum window keyed on
    (lang) ordered by doc_id, bin = floor(cum_before / budget). This is
    deterministic next-fit packing. Partition-local ordering is the
    100 TB-honest formulation: a global greedy pack is inherently
    sequential, while per-shard packing (shard = lang here, = input
    split in production) is what distributed trainers actually do, and
    costs one window shuffle on the shard key.

Token counts use the deterministic chars/4 estimate ((n_chars+3) div 4,
integer arithmetic end-to-end) — swap in doc_bpe_token_stats' regex
count when real budgets matter; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io

CHUNK_CHARS = 200
CHUNK_STRIDE = 150
PACK_BUDGET = 1024


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks per document, with a content hash
    per chunk (the unit a downstream tokenizer/dedup stage consumes)."""
    d = io.load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n_chars"), F.lit(1)).cast("int"), F.lit(CHUNK_STRIDE)
    )
    chunk = F.expr(f"substring(text, chunk_start, {CHUNK_CHARS})")
    return (
        d.select("doc_id", "lang", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            "lang",
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.length(chunk).alias("chunk_chars"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


DOC_CHUNKS_SQL = f"""
WITH c AS (
  SELECT doc_id, lang, text,
         unnest(range(1, GREATEST(n_chars, 1) + 1, {CHUNK_STRIDE})) AS chunk_start
  FROM documents
)
SELECT doc_id, lang, chunk_start,
       length(substring(text, CAST(chunk_start AS INT), {CHUNK_CHARS})) AS chunk_chars,
       md5(substring(text, CAST(chunk_start AS INT), {CHUNK_CHARS})) AS chunk_md5
FROM c
"""


def pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic next-fit packing of documents into 1024-token bins
    per language shard: running sum before each doc → bin id. Integer
    arithmetic end-to-end, so bin assignment is identical under any
    partitioning/engine."""
    d = io.load(spark, sf_dir, "documents")
    tok = F.expr("(n_chars + 3) div 4")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok).over(w), F.lit(0))
    return (
        d.select(
            "lang",
            "doc_id",
            tok.alias("doc_tokens"),
            F.floor(cum_before / PACK_BUDGET).alias("bin_id"),
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


PACK_BINS_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, (n_chars + 3) // 4 AS doc_tokens,
         COALESCE(sum((n_chars + 3) // 4) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
)
SELECT lang, CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(doc_tokens) AS BIGINT) AS bin_tokens
FROM t
GROUP BY 1, 2
ORDER BY 1, 2
"""
