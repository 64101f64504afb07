"""Repetition-based quality filtering and winnowing fingerprints over
``documents`` — the Gopher-rule / MOSS corner of a pretraining data
pipeline.

The reference has no analytics surface (maillog2db.go:180-280 is pure
ingest); these extend the engine's north-star corpus operators. All
expressions are built-in (array HOFs + one explode shuffle), each with
an exact DuckDB twin.

Scale design (100 TB):
  * repetition_stats: the n-gram duplicate fractions are computed
    array-level per row (no shuffle at all); the top-unigram fraction
    needs a (doc_id, token) count → ONE shuffle keyed on doc_id that
    is map-side combined, and the final join back to the array-level
    stats is co-partitioned on doc_id (the repartition in the shared
    scan pre-aligns it).
  * winnowing: strictly per-row (transform + slice + array_min), zero
    shuffles — the fingerprint selection that makes cross-doc overlap
    detection sub-quadratic runs embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from .dedup import _TOKENS_DUCK, _TOKENS_SPARK

# Gopher-style repetition thresholds (ppm). Set from the corpus's
# measured distribution so the flag bites: top-unigram p80 ≈ 12%,
# duplicate-bigram p90 ≈ 6%.
TOP_UNIGRAM_PPM_MAX = 120_000
DUP_BIGRAM_PPM_MAX = 60_000


def _dup_ngram_frac_spark(n: int) -> str:
    """1 - distinct/total word n-grams, as a Spark SQL expression over a
    materialized `toks` column. Empty-gram docs → 0."""
    total = f"size(toks) - {n - 1}"
    grams = (
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> array_join(slice(toks, i, {n}), ' '))"
    )
    return (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"1.0 - CAST(size(array_distinct({grams})) AS DOUBLE) / ({total}) "
        "ELSE 0.0 END"
    )


def _dup_ngram_frac_duck(n: int) -> str:
    total = f"(len(toks) - {n - 1})"
    grams = (
        f"list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))"
    )
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / {total} "
        "ELSE 0.0 END"
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition profile per document: top-unigram
    fraction, duplicate bigram/5-gram fractions (all ppm integers), and
    the keep/drop flag a curation pipeline cuts on.

    Two subtrees share one scan: the n-gram fractions are pure
    array-level expressions (no shuffle); the unigram mode needs a
    (doc_id, tok) count — one map-side-combined shuffle — and joins
    back co-partitioned on doc_id."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    base = d.select("doc_id", "lang", F.expr(_TOKENS_SPARK).alias("toks"))

    ppm = lambda c: F.floor(c * 1_000_000 + 0.5).cast("bigint")
    arr_stats = base.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        ppm(F.expr(_dup_ngram_frac_spark(2))).alias("dup_bigram_ppm"),
        ppm(F.expr(_dup_ngram_frac_spark(5))).alias("dup_5gram_ppm"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n"))
        .select(
            "doc_id",
            ppm(F.col("top_c").cast("double") / F.col("n")).alias("top_unigram_ppm"),
        )
    )
    out = arr_stats.join(top, "doc_id")
    keep = (F.col("top_unigram_ppm") <= TOP_UNIGRAM_PPM_MAX) & (
        F.col("dup_bigram_ppm") <= DUP_BIGRAM_PPM_MAX
    )
    return out.select(
        "doc_id", "lang", "n_tokens",
        "top_unigram_ppm", "dup_bigram_ppm", "dup_5gram_ppm",
        keep.alias("keep"),
    )


REPETITION_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {_TOKENS_DUCK} AS toks FROM documents
), arr AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
         CAST(floor(({_dup_ngram_frac_duck(2)}) * 1000000 + 0.5) AS BIGINT) AS dup_bigram_ppm,
         CAST(floor(({_dup_ngram_frac_duck(5)}) * 1000000 + 0.5) AS BIGINT) AS dup_5gram_ppm
  FROM t
), u AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), cnt AS (
  SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2
), top AS (
  SELECT doc_id,
         CAST(floor(max(c)::DOUBLE / sum(c) * 1000000 + 0.5) AS BIGINT)
           AS top_unigram_ppm
  FROM cnt GROUP BY 1
)
SELECT a.doc_id, a.lang, a.n_tokens,
       t.top_unigram_ppm, a.dup_bigram_ppm, a.dup_5gram_ppm,
       (t.top_unigram_ppm <= {TOP_UNIGRAM_PPM_MAX}
        AND a.dup_bigram_ppm <= {DUP_BIGRAM_PPM_MAX}) AS keep
FROM arr a JOIN top t USING (doc_id)
"""


# --- winnowing fingerprints (MOSS) ------------------------------------------

WINNOW_K = 8  # character k-gram width
WINNOW_W = 8  # winnowing window (guarantee: any match ≥ k+w-1 chars is caught)


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection: md5 every character
    k-gram, keep the window-minimum hash of every w-window, distinct
    the selections. The per-doc fingerprint set is what a plagiarism /
    near-dup index stores — ~1/w of the grams, with the guarantee that
    any shared substring of length ≥ k+w-1 shares a fingerprint.

    Hex md5 prefixes order-compare identically in Spark and DuckDB, so
    window-min selection is engine-stable. Entirely per-row (zero
    shuffles); the repartition exists because HOF lambdas are
    interpreted and a small scan is one partition otherwise."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    grams = (
        f"transform(sequence(1, length(text) - {WINNOW_K - 1}), "
        f"i -> substring(md5(substring(text, i, {WINNOW_K})), 1, 16))"
    )
    sel = (
        f"array_distinct(transform(sequence(1, size(grams) - {WINNOW_W - 1}), "
        f"j -> array_min(slice(grams, j, {WINNOW_W}))))"
    )
    return (
        d.filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
        .select("doc_id", F.expr(grams).alias("grams"))
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.expr(sel).alias("fps"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").alias("n_fingerprints"),
            F.array_min("fps").alias("fp_min"),
            F.array_max("fps").alias("fp_max"),
        )
    )


WINNOWING_SQL = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(text) - {WINNOW_K - 1}),
                        i -> substr(md5(substr(text, i, {WINNOW_K})), 1, 16)) AS grams
  FROM documents
  WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
), s AS (
  SELECT doc_id, len(grams) AS n_grams,
         list_distinct(list_transform(generate_series(1, len(grams) - {WINNOW_W - 1}),
                        j -> list_min(list_slice(grams, j, j + {WINNOW_W - 1})))) AS fps
  FROM g
)
SELECT doc_id, n_grams, len(fps) AS n_fingerprints,
       list_min(fps) AS fp_min, list_max(fps) AS fp_max
FROM s
"""
