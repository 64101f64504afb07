"""Benchmark decontamination: n-gram overlap of corpus documents
against a held-out evaluation set.

The standard pretraining hygiene op (strip eval-set leakage before
training): a document is contaminated to the degree its shingles appear
in the benchmark set. Here the `src0` source plays the benchmark; the
rest of `documents` is the corpus.

Scale posture: the benchmark shingle set is DISTINCT'd then broadcast —
real eval suites are a few MB, so the corpus side never shuffles at
all (the per-doc counts ride the shingle explode's existing
partitioning). If the benchmark side ever outgrows broadcast range,
the drop-in replacement is a bloom-filter semi-join (build the filter
over bench shingles, push it into the corpus scan) — same plan shape,
no exact join needed for a screening op. Contamination ratio is pure
integer arithmetic (ppm via integer division), so the gate is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _SHINGLES_DUCK, _with_shingles

BENCH_SOURCE = "src0"
CONTAM_PPM_THRESHOLD = 100_000  # ≥10% shingle overlap → contaminated


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus doc: shingle count, benchmark-overlap count, overlap
    ppm, and the ≥10% contamination flag."""
    sh = _with_shingles(spark, sf_dir, extra_cols=("source",)).localCheckpoint(eager=False)
    bench = (
        sh.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    corpus = sh.filter(F.col("source") != BENCH_SOURCE)
    hits = (
        corpus.select("doc_id", F.explode("sh").alias("shingle"))
        .join(F.broadcast(bench), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    tot = corpus.select("doc_id", F.size("sh").cast("bigint").alias("n_shingles"))
    n_cont = F.coalesce(F.col("hits"), F.lit(0)).cast("bigint")
    ppm = F.when(
        F.col("n_shingles") > 0, F.expr("n_contaminated * 1000000 div n_shingles")
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        tot.join(hits, "doc_id", "left")
        .withColumn("n_contaminated", n_cont)
        .withColumn("contam_ppm", ppm)
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            "contam_ppm",
            (F.col("contam_ppm") >= CONTAM_PPM_THRESHOLD).alias("is_contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH sh AS (
  SELECT doc_id, source, {_SHINGLES_DUCK} AS sh FROM documents
), bench AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE source = '{BENCH_SOURCE}'
), corpus AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE source <> '{BENCH_SOURCE}'
), hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM corpus WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY 1
), tot AS (
  SELECT doc_id, len(sh) AS n_shingles FROM sh WHERE source <> '{BENCH_SOURCE}'
)
SELECT t.doc_id, t.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CASE WHEN t.n_shingles > 0
            THEN COALESCE(h.n_contaminated, 0) * 1000000 // t.n_shingles
            ELSE 0 END AS contam_ppm,
       (CASE WHEN t.n_shingles > 0
             THEN COALESCE(h.n_contaminated, 0) * 1000000 // t.n_shingles
             ELSE 0 END) >= {CONTAM_PPM_THRESHOLD} AS is_contaminated
FROM tot t LEFT JOIN hits h USING (doc_id)
"""
