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


# --- bloom-filter path (the huge-benchmark variant) -------------------------

# 2^19 bits / 3 hashes ≈ 1% fpp at the sf0.1 bench-shingle cardinality;
# at real scale these grow with the eval suite (bits ≈ -n·ln(p)/ln(2)²).
# Power-of-two bit count keeps word/byte indexing exact.
BLOOM_N_BITS = 1 << 19
BLOOM_N_HASHES = 3
CONTAM_DOC_PPM = CONTAM_PPM_THRESHOLD


def _bloom_pos(i: int) -> str:
    """SQL for the i-th bloom bit position of column `shingle`: seeded
    xxhash64 (the seed literal makes the k hashes independent)."""
    return f"pmod(xxhash64(shingle, {i}), {BLOOM_N_BITS}L)"


def _bloom_probe(i: int) -> str:
    """SQL testing bloom bit `_bloom_pos(i)` of binary column `bf`:
    pull the byte (substring on binary), decode via hex→conv (Spark has
    no byte-extract builtin; a 1-byte conv can't overflow), test the
    bit. All builtins → stays inside whole-stage codegen."""
    pos = _bloom_pos(i)
    byte = f"cast(conv(hex(substring(bf, cast({pos} div 8 as int) + 1, 1)), 16, 10) as int)"
    return f"(({byte} >> cast({pos} % 8 as int)) & 1) = 1"


def _build_bloom(bench: DataFrame) -> bytes:
    """Build the bloom bitset DISTRIBUTED: explode each bench shingle to
    its k bit positions, pack per 64-bit word with a map-side-combined
    bit_or aggregate, and collect only the ≤ n_bits/64 (word, bits)
    rows. The few-hundred-KB bytearray is the one legitimate driver
    hop: it IS the data structure being shipped, like a broadcast var.
    """
    positions = bench.select(
        F.explode(F.array(*[F.expr(_bloom_pos(i)) for i in range(BLOOM_N_HASHES)])).alias("pos")
    )
    words = (
        positions.select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    buf = bytearray(BLOOM_N_BITS // 8)
    for w, bits in words.collect():
        bits &= (1 << 64) - 1
        for b in range(8):
            buf[w * 8 + b] = (bits >> (8 * b)) & 0xFF
    return bytes(buf)


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination summary per corpus source, via the bloom-filter
    plan `decontaminate` documents as its huge-benchmark swap-in —
    implemented for real, not just described.

    Plan: (1) build ONE bloom filter over the benchmark shingles
    (distributed bit_or word aggregation — a few hundred KB however
    large the bench is, vs broadcasting the full shingle set; Spark's
    own bloom_filter_agg/might_contain are internal-only, so the bitset
    is built from public expressions); (2) push the k-probe bit test as
    a row-local prefilter on the exploded corpus shingles — definite
    misses never reach the join, so the shuffle carries only candidate
    rows; (3) exact-confirm survivors with a shuffled semi-join (hinted
    SHUFFLE_HASH: at huge-bench scale the build side exceeds broadcast
    range by construction, so the plan must not rely on it). Bloom
    false positives are removed by step (3), so the result is EXACT —
    same oracle semantics as the broadcast path, different physical
    plan. The bitset enters the plan as one binary literal, so the
    probes stay whole-stage-codegen-eligible."""
    sh = _with_shingles(spark, sf_dir, extra_cols=("source",)).localCheckpoint(eager=False)
    bench = (
        sh.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    bloom = _build_bloom(bench)
    corpus = sh.filter(F.col("source") != BENCH_SOURCE)
    probe = " AND ".join(_bloom_probe(i) for i in range(BLOOM_N_HASHES))
    candidates = (
        corpus.select("doc_id", F.explode("sh").alias("shingle"))
        .withColumn("bf", F.lit(bloom))
        .filter(F.expr(probe))
        .drop("bf")
    )
    hits = (
        candidates.join(bench.hint("shuffle_hash"), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    tot = corpus.select(
        "doc_id", "source", F.size("sh").cast("bigint").alias("n_shingles")
    )
    per_doc = tot.join(hits, "doc_id", "left").select(
        "source",
        "n_shingles",
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("n_hit"),
    )
    contaminated = F.when(
        (F.col("n_shingles") > 0)
        & (F.expr("n_hit * 1000000 div n_shingles") >= CONTAM_DOC_PPM),
        1,
    ).otherwise(0)
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(contaminated).cast("bigint").alias("n_contaminated_docs"),
        F.sum("n_hit").alias("n_hit_shingles"),
    )


BLOOM_DECONTAMINATE_SQL = f"""
WITH sh AS (
  SELECT doc_id, source, {_SHINGLES_DUCK} AS sh FROM documents
), bench AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE source = '{BENCH_SOURCE}'
), corpus AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE source <> '{BENCH_SOURCE}'
), hits AS (
  SELECT doc_id, count(*) AS n_hit
  FROM corpus WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY 1
), per_doc AS (
  SELECT s.source, len(s.sh) AS n_shingles, COALESCE(h.n_hit, 0) AS n_hit
  FROM sh s LEFT JOIN hits h USING (doc_id)
  WHERE s.source <> '{BENCH_SOURCE}'
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN n_shingles > 0
                      AND n_hit * 1000000 // n_shingles >= {CONTAM_DOC_PPM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated_docs,
       CAST(sum(n_hit) AS BIGINT) AS n_hit_shingles
FROM per_doc GROUP BY source
"""


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
