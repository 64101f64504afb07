"""Deterministic sampling operators for training-data pipelines.

Corpus rebalancing (downsample over-represented languages/sources) is a
first-class LLM-data op. Spark's sample()/sampleBy() draw from a seeded
RNG whose stream depends on partitioning — results change under
repartition, AQE, or speculative retry. These operators derive the
uniform variate from CONTENT (md5 of the stable key), so membership is
a pure function of the row: reproducible across engines (DuckDB oracle
hash-matches), across partitionings, and across reruns — which also
makes the sample exactly-once under streaming replay (ST5's contract:
recomputation must be idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

# per-language keep rates: downsample the over-represented languages,
# keep the tail whole (the standard rebalancing move)
STRATA_RATES: dict[str, float] = {"en": 0.25, "es": 0.5, "de": 0.5, "fr": 0.5}
DEFAULT_RATE = 1.0


def _uniform(key) -> "F.Column":
    """Content-derived U(0,1): first 32 md5 bits of the key / 2^32."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(2**32))
    )


def strata_keep_predicate() -> "F.Column":
    """The stratified-sample membership predicate — a pure function of
    (doc_id, lang); shared by the batch operator and the streaming
    dual so the two can never drift."""
    rate = F.lit(DEFAULT_RATE)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return _uniform(F.col("doc_id")) < rate


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample of documents. Embarrassingly
    parallel — a pure per-row predicate, no shuffle, no state; the
    filter pushes to the scan output and the plan is a single
    codegen'd stage. Streaming dual: streaming_mix (same predicate,
    per-batch append)."""
    d = io.load(spark, sf_dir, "documents")
    return d.filter(strata_keep_predicate()).select("doc_id", "lang", "source")


_RATE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in STRATA_RATES.items()
) + f" ELSE {DEFAULT_RATE} END"

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT::DOUBLE
      / 4294967296.0 < {_RATE_SQL}
"""


# --- leakage-safe train/val/test split ---------------------------------------

SPLIT_VAL_PPM = 50_000  # 5% validation
SPLIT_TEST_PPM = 50_000  # 5% test (train gets the rest)


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment with DUPLICATE-LEAKAGE
    safety: the split variate derives from the content FINGERPRINT
    (md5 of (lang, text)), not the doc id, so byte-identical copies of
    a document land in the SAME split by construction — the classic
    eval-contamination failure (train/test both containing a duplicate)
    cannot happen no matter how many copies exist or in what order they
    arrive. Same purity contract as the other sampling ops: a pure
    function of the row, stable under repartition, AQE, and replay.

    Output is the per-(split, lang) audit: doc count, distinct content
    groups, char mass — the record reviewed before an eval is trusted.
    Plan: one codegen'd projection + one aggregation; the split itself
    (a per-row column) is reusable by any downstream writer."""
    d = io.load(spark, sf_dir, "documents")
    # explicit coalesce: concat_ws silently SKIPS nulls while the
    # oracle's || propagates them — a NULL text must fingerprint as ''
    # on both engines, not diverge
    fp = F.md5(
        F.concat_ws("\x1f", F.coalesce("lang", F.lit("")), F.coalesce("text", F.lit("")))
    )
    u_ppm = F.floor(_uniform(fp) * 1_000_000).cast("bigint")
    split = (
        F.when(u_ppm < SPLIT_VAL_PPM, "val")
        .when(u_ppm < SPLIT_VAL_PPM + SPLIT_TEST_PPM, "test")
        .otherwise("train")
    )
    return (
        d.select(split.alias("split"), "lang", fp.alias("fingerprint"), "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_groups"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


_SPLIT_FP = "md5(coalesce(lang, '') || chr(31) || coalesce(text, ''))"
_SPLIT_U_PPM = (
    f"CAST(floor(('0x' || substr(md5({_SPLIT_FP}), 1, 8))::BIGINT::DOUBLE"
    " / 4294967296.0 * 1000000) AS BIGINT)"
)

LEAKAGE_SAFE_SPLIT_SQL = f"""
WITH t AS (
  SELECT CASE WHEN {_SPLIT_U_PPM} < {SPLIT_VAL_PPM} THEN 'val'
              WHEN {_SPLIT_U_PPM} < {SPLIT_VAL_PPM + SPLIT_TEST_PPM} THEN 'test'
              ELSE 'train' END AS split,
         lang, {_SPLIT_FP} AS fingerprint, n_chars
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
       count(DISTINCT fingerprint) AS n_groups,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY split, lang
"""


# per-source mixing weights: >1 upsamples (integer copies + hash-gated
# fractional copy), <1 downsamples, 0 drops — the data-mixing step of a
# pretraining pipeline
MIX_WEIGHTS: dict[str, float] = {"src1": 2.5, "src2": 0.3, "src3": 0.0}
DEFAULT_WEIGHT = 1.0


def mix_copies_col() -> "F.Column":
    """Copy count per document for source mixing — a pure function of
    (doc_id, source); shared by the batch operator and the streaming
    dual so the two can never drift."""
    w = F.lit(DEFAULT_WEIGHT)
    for src, r in MIX_WEIGHTS.items():
        w = F.when(F.col("source") == src, F.lit(r)).otherwise(w)
    base = F.floor(w)
    return (
        base + F.when(_uniform(F.col("doc_id")) < w - base, 1).otherwise(0)
    ).cast("int")


def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: each document emits floor(w) copies plus
    one more when its content-hash uniform falls under frac(w). Same
    determinism contract as stratified_sample (pure function of the
    row — stable under repartition, AQE, streaming replay), and the
    explode is data-parallel: no shuffle anywhere, output size is
    sum(w_s × |source_s|) by construction."""
    d = io.load(spark, sf_dir, "documents")
    return (
        d.withColumn("n_copies", mix_copies_col())
        .select(
            "doc_id",
            "source",
            F.explode(
                F.when(F.col("n_copies") >= 1, F.expr("sequence(1, n_copies)"))
                .otherwise(F.expr("array()"))
            ).alias("copy_id_i"),
        )
        .select("doc_id", "source", F.col("copy_id_i").cast("bigint").alias("copy_id"))
    )


# --- deterministic training-shard assignment --------------------------------

N_SHARDS = 8


def member_checksum(key) -> "F.Column":
    """Order-independent per-member checksum term: md5 bits 33–64 of
    the key as a bigint. Summed per shard it detects loss/duplication/
    mis-assignment without reading payloads. SINGLE source of truth for
    the manifest ≡ audit ≡ query integrity contract — the writer
    (sinks.write_training_shards), the file-level audit, and the
    registered doc_shard_assignment query all call this; a drift in any
    copy would silently break shard-loss detection."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 9, 8), 16, 10
    ).cast("bigint")


def shard_id(key) -> "F.Column":
    """Content-derived shard id: first 32 md5 bits of the key mod
    N_SHARDS. Same determinism contract as _uniform — a pure function
    of the row, so shard membership is stable under repartition, AQE,
    speculative retry, and streaming replay; an exporter that dies
    mid-write re-produces byte-identical shard populations."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(N_SHARDS),
    ).cast("bigint")


def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest: per-shard doc count, char mass,
    id range, and an order-independent content checksum (sum of each
    member's md5 bits 33–64 — commutative, so any partitioning/merge
    order hashes identically). This is the audit record a shard writer
    (sinks.write_training_shards) emits next to the data; comparing two
    manifests detects a lost/duplicated shard without reading data.
    Plan: one codegen'd projection + one shuffle on shard_id."""
    d = io.load(spark, sf_dir, "documents")
    member_sum = member_checksum(F.col("doc_id"))
    return (
        d.select(shard_id(F.col("doc_id")).alias("shard_id"), "doc_id", "n_chars", member_sum.alias("csum"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("csum").alias("checksum"),
        )
    )


SHARD_ASSIGNMENT_SQL = f"""
SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {N_SHARDS} AS shard_id,
       count(*) AS n_docs,
       -- CAST: DuckDB sum(BIGINT) widens to HUGEINT (→ object in pandas)
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT) AS BIGINT) AS checksum
FROM documents GROUP BY 1
"""


_W_SQL = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in MIX_WEIGHTS.items()
) + f" ELSE {DEFAULT_WEIGHT} END"


# --- weighted sampling without replacement (Efraimidis–Spirakis) ------------

SAMPLE_K = 120  # target sample size


def weighted_key(doc_id_col, n_chars_col) -> "F.Column":
    """The Efraimidis–Spirakis inclusion key u^(1/w) — SINGLE source of
    truth shared by the batch sample and the streaming reservoir
    (streaming_sample.py): both must rank by the identical key or the
    stream≡batch equivalence breaks."""
    w = F.greatest(F.coalesce(n_chars_col, F.lit(0)), F.lit(1)).cast("double")
    return F.round(F.pow(_uniform(doc_id_col), F.lit(1.0) / w), 9)


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement via the
    Efraimidis–Spirakis exponential-key trick: each row gets key
    u^(1/w) (u = content-derived uniform, w = char mass as the
    token-budget proxy) and the global top-k keys are the sample —
    inclusion probability proportional to weight, no two draws of the
    same row, and, because u comes from the content hash rather than an
    RNG stream, the sample is a pure function of the data: identical
    under repartition, AQE, speculative retry, and streaming replay.

    Scale: orderBy().limit(k) compiles to TakeOrderedAndProject —
    each task keeps a k-row heap and the driver merges per-partition
    heaps; no global sort, no shuffle of the corpus, memory O(k) per
    task. This is the 100 TB-safe form of "sample 1M docs by token
    mass from the whole corpus".

    The key is rounded to 9 decimals with doc_id as tiebreak so
    selection at the cutoff cannot depend on last-ulp libm differences
    between engines (pow is the one transcendental here)."""
    d = io.load(spark, sf_dir, "documents")
    key = weighted_key(F.col("doc_id"), F.col("n_chars"))
    return (
        d.select("doc_id", "source", "n_chars", key.alias("wkey"))
        .orderBy(F.desc("wkey"), F.asc("doc_id"))
        .limit(SAMPLE_K)
        .select("doc_id", "source", "n_chars")
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         round(pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT::DOUBLE
                   / 4294967296.0,
                   1.0 / CAST(greatest(coalesce(n_chars, 0), 1) AS DOUBLE)), 9) AS wkey
  FROM documents
)
ORDER BY wkey DESC, doc_id ASC
LIMIT {SAMPLE_K}
"""

SOURCE_MIX_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         CAST(floor({_W_SQL}) +
              CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT::DOUBLE
                        / 4294967296.0 < ({_W_SQL}) - floor({_W_SQL})
                   THEN 1 ELSE 0 END AS INT) AS n_copies
  FROM documents
)
SELECT doc_id, source, unnest(range(1, CAST(n_copies AS BIGINT) + 1)) AS copy_id
FROM w
"""


# --- temperature-scaled source sampling policy --------------------------------

TEMP_ALPHA_NOTE = "alpha = 0.5 (sqrt)"  # see docstring: sqrt, not pow


def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-temperature source sampling policy (the mT5/XLM-R upsampling
    rule): sampling share q_s ∝ p_s^α flattens the source distribution
    so long-tail sources aren't drowned by the head. α is fixed at 0.5
    — deliberately, a numerics decision: q_s ∝ √n_s and IEEE sqrt is
    CORRECTLY ROUNDED on every platform, where pow(x, 0.3) is
    libm-dependent (Java Math.pow allows 1-ulp error) and could split
    a hash gate on the last ulp. √n_s quantizes to ppm integers BEFORE
    the cross-source normalization, so shares are exact integer ratios.

    Output per source: corpus share, temperature share, and the boost
    factor q_s/p_s a sampler applies as per-doc weight. Plan shape:
    one map-side-combined groupBy(source) + a 1-row total broadcast —
    the policy table is sources-sized; nothing corpus-scale moves."""
    d = io.load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return temperature_mix_from_counts(per_src)


def temperature_mix_from_counts(per_src: DataFrame) -> DataFrame:
    """The policy math from a (source, n_docs) table — shared by the
    batch operator above and the streaming vocabulary store
    (streaming_vocab.py), where doc counts resolve from additive
    batch partials."""
    per_src = per_src.withColumn(
        "sqrt_upm",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000 + 0.5).cast(
            "bigint"
        ),
    )
    tot = per_src.agg(
        F.sum("n_docs").alias("n_total"), F.sum("sqrt_upm").alias("sqrt_total")
    )
    out = per_src.join(F.broadcast(tot))
    return out.select(
        "source",
        "n_docs",
        F.expr("CAST(n_docs * 1000000 div n_total AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(sqrt_upm * 1000000 div sqrt_total AS BIGINT)").alias(
            "temp_share_ppm"
        ),
        # boost = q/p as exact integer cross-products: (sqrt_upm *
        # n_total * 1e6) div (sqrt_total * n_docs)
        F.expr(
            "CAST(sqrt_upm * n_total * 1000000 div (sqrt_total * n_docs) AS BIGINT)"
        ).alias("boost_ppm"),
    )


SOURCE_TEMPERATURE_MIX_SQL = """
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS sqrt_upm
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(n_docs) AS n_total, sum(sqrt_upm) AS sqrt_total FROM per_src
)
SELECT source, n_docs,
       CAST(n_docs * 1000000 // n_total AS BIGINT) AS share_ppm,
       CAST(sqrt_upm * 1000000 // sqrt_total AS BIGINT) AS temp_share_ppm,
       CAST(sqrt_upm * n_total * 1000000 // (sqrt_total * n_docs) AS BIGINT)
         AS boost_ppm
FROM per_src CROSS JOIN tot
"""


# --- deterministic epoch shuffle (training-order export) --------------------

SHUFFLE_EPOCHS = 2
SHUFFLE_SHARD_SIZE = 64  # docs per serving shard within an epoch


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global training order: every epoch gets
    an independent pseudo-random permutation of the corpus (md5 of
    "epoch:doc_id" — replayable under repartition and across engines,
    the same content-derived idiom as the samplers), materialized as
    (position, shard, slot) so a trainer can stream shard files in
    order. This is the training-order export step after
    `doc_shard_assignment` (which buckets but does not ORDER): epoch
    reshuffles change data order between passes without any stateful
    shuffle buffer, a requirement the epochs-over-100-TB regime cannot
    meet with an in-memory permutation.

    Scale shape: the epoch fan-out is a SHUFFLE_EPOCHS-way in-expression
    explode; the global order per epoch comes from ONE composite
    two-phase distributed rank over (epoch, key, doc_id) — epochs are
    contiguous equal-size rank blocks, so per-epoch position is
    `rank - epoch*n` with the corpus count riding a 1-row scalar
    broadcast. No unpartitioned window, no single-task sort (an ntile/
    row_number PARTITION BY epoch would funnel the whole corpus
    through SHUFFLE_EPOCHS tasks)."""
    from .windows import distributed_cumulative

    docs = io.load(spark, sf_dir, "documents").select("doc_id")
    fan = docs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {SHUFFLE_EPOCHS - 1})")).alias("epoch"),
    ).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("skey"),
    )
    # r10: |fan| = n_docs x SHUFFLE_EPOCHS by construction, and the
    # docs count is a metadata-cheap parquet row count — skip the
    # dc-internal count of the exploded (md5-keyed) fan table, and
    # inline the same n_docs into the per-epoch position arithmetic
    # instead of a broadcast-join of a 1-row aggregate.
    nd = docs.count()
    g = distributed_cumulative(
        fan, [F.col("epoch"), F.col("skey"), F.col("doc_id")],
        n_rows=nd * SHUFFLE_EPOCHS,
    )
    return (
        g.withColumn(
            "pos", (F.col("_grank") - 1 - F.col("epoch") * F.lit(nd)).cast("bigint")
        )
        .select(
            "epoch",
            "doc_id",
            "pos",
            F.expr(f"pos div {SHUFFLE_SHARD_SIZE}").cast("bigint").alias("shard"),
            F.expr(f"pos % {SHUFFLE_SHARD_SIZE}").cast("bigint").alias("slot"),
        )
    )


EPOCH_SHUFFLE_SQL = f"""
WITH fan AS (
  SELECT t.epoch, d.doc_id,
         (('0x' || substr(md5(t.epoch || ':' || d.doc_id), 1, 8))::BIGINT) AS skey
  FROM documents d CROSS JOIN (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) t
), ranked AS (
  SELECT epoch, doc_id,
         CAST(row_number() OVER (PARTITION BY epoch
                                 ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
  FROM fan
)
SELECT epoch, doc_id, pos,
       CAST(pos // {SHUFFLE_SHARD_SIZE} AS BIGINT) AS shard,
       CAST(pos % {SHUFFLE_SHARD_SIZE} AS BIGINT) AS slot
FROM ranked
"""


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered training export (Bengio et al. 2009 shape,
    as data pipelines run it: easy/clean first): global order =
    quality DECILE descending, deterministic md5 shuffle within a
    decile — the trainer streams the highest-quality tenth first
    without any quality-correlated ordering artifacts inside a tier
    (the md5 key de-correlates neighbors, the same content-derived
    idiom as epoch_shuffle). Output is the (pos, shard, slot) layout
    contract of `doc_epoch_shuffle`.

    Two consumers of the size-adaptive two-phase rank, zero
    unpartitioned windows: pass 1 ranks (coalesced) quality for the
    integer-exact decile (ntile_from_rank over the 1-row count
    broadcast); pass 2 ranks (decile desc, md5 key, doc_id) for the
    global position. NULL quality (empty docs) coalesces to -1 —
    explicitly BELOW every real score on both engines, rather than
    riding engine-specific NULL ordering."""
    from .windows import distributed_cumulative, ntile_from_rank
    from .text import quality_score

    # ONE cardinality job serves both rank passes and the ntile total
    # (r10): rank passes preserve row count, so |q| == |ranked| ==
    # |decs| — the previous form paid three sequential driver jobs
    # (two dc-internal counts + ranked.count()) for the same number.
    q = quality_score(spark, sf_dir).select(
        "doc_id", F.coalesce("quality_ppm", F.lit(-1)).alias("qv")
    ).localCheckpoint(eager=False)
    cnt = q.count()
    ranked = distributed_cumulative(
        q, [F.col("qv"), F.col("doc_id")], n_rows=cnt
    )
    n = ranked.sparkSession.createDataFrame([(cnt,)], "n_total bigint")
    decs = (
        ranked.join(F.broadcast(n))
        .withColumn("decile", ntile_from_rank("_grank", "n_total", 10))
        .select(
            "doc_id", "qv", "decile",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("cur:"), F.col("doc_id"))), 1, 8),
                16, 10,
            ).cast("bigint").alias("skey"),
        )
    )
    g = distributed_cumulative(
        decs, [F.col("decile").desc(), F.col("skey"), F.col("doc_id")],
        n_rows=cnt,
    )
    return g.select(
        "doc_id",
        F.col("decile").cast("int").alias("decile"),
        (F.col("_grank") - 1).cast("bigint").alias("pos"),
        F.expr(f"(_grank - 1) div {SHUFFLE_SHARD_SIZE}").cast("bigint").alias("shard"),
        F.expr(f"(_grank - 1) % {SHUFFLE_SHARD_SIZE}").cast("bigint").alias("slot"),
    )


CURRICULUM_ORDER_SQL = f"""
WITH q AS ({{quality_sql}}),
qq AS (
  SELECT doc_id, coalesce(quality_ppm, -1) AS qv FROM q
), decs AS (
  SELECT doc_id, qv,
         CAST(ntile(10) OVER (ORDER BY qv, doc_id) AS INT) AS decile,
         (('0x' || substr(md5('cur:' || doc_id), 1, 8))::BIGINT) AS skey
  FROM qq
)
SELECT doc_id, decile,
       CAST(row_number() OVER (ORDER BY decile DESC, skey, doc_id) - 1 AS BIGINT)
         AS pos,
       CAST((row_number() OVER (ORDER BY decile DESC, skey, doc_id) - 1)
            // {SHUFFLE_SHARD_SIZE} AS BIGINT) AS shard,
       CAST((row_number() OVER (ORDER BY decile DESC, skey, doc_id) - 1)
            % {SHUFFLE_SHARD_SIZE} AS BIGINT) AS slot
FROM decs
"""


# --- DoReMi-style mixture reweighting (Xie et al. 2023) ----------------------

DOREMI_ITERS = 5          # unrolled in the oracle SQL; keep in sync
DOREMI_ETA_PPM = 100_000  # Hedge learning rate η = 0.1


def doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture reweighting in the DoReMi family (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining", arXiv:2305.10429): run multiplicative-weights /
    Hedge over per-SOURCE excess LM loss, upweighting domains the
    reference model finds hard — the mixture-optimization step between
    DSIR's example-level weights and the α-temperature policy's
    count-only shares. The full method trains a proxy model per round;
    this is the published update rule driven by the engine's unigram-LM
    loss (the same reference-loss proxy the doc-level scorer uses).

    Determinism: the textbook update w ← w·exp(η·excess) is libm
    territory (Math.exp vs C exp may split an ulp, and T iterations
    compound it), so the engine uses the STANDARD linearized Hedge
    variant w ← w·(1 + η·excess) — exact bigint products with div
    normalization, clamped at 1 so a strongly-easy domain can't go
    non-positive. Every column is an exact integer on both engines;
    the whole T-step trajectory is certified by the gate hash (the
    kcenter/BPE unrolled-oracle pattern).

    Plan shape: ONE token explode + the unigram vocab join (Zipf-
    bounded, AQE-broadcast) + a map-side-combined groupBy(source);
    everything after is sources-grain (a handful of rows) — the
    iteration moves no corpus-scale data, same as the temperature
    policy above."""
    from .corpus_analytics import _vocab_nll
    from .dedup import _TOKENS_SPARK

    d = io.load(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.expr(_TOKENS_SPARK)).alias("tok"))
    scored = toks.join(_vocab_nll(spark, sf_dir), "tok").select(
        "source", "nll_ppm"
    )
    src = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("nll_ppm").alias("s"),
    )
    ref = src.agg(F.expr("CAST(sum(s) div sum(n_tokens) AS BIGINT)").alias("ref"))
    cur = (
        src.join(F.broadcast(ref))
        .select(
            "source",
            "n_tokens",
            F.expr("CAST(s div n_tokens AS BIGINT)").alias("avg_nll_ppm"),
            F.expr("CAST(s div n_tokens AS BIGINT) - ref").alias("excess_ppm"),
            F.lit(1_000_000).cast("bigint").alias("w"),
        )
    )
    for _ in range(DOREMI_ITERS):
        cur = cur.withColumn(
            "w",
            F.expr(
                f"greatest(w * (1000000 + {DOREMI_ETA_PPM} * excess_ppm"
                " div 1000000) div 1000000, 1)"
            ),
        )
    tw = cur.agg(F.sum("w").alias("tw"))
    return cur.join(F.broadcast(tw)).select(
        "source",
        "n_tokens",
        "avg_nll_ppm",
        "excess_ppm",
        F.expr("CAST(w * 1000000 div tw AS BIGINT)").alias("weight_ppm"),
    )


def _doremi_sql() -> str:
    from .dedup import _TOKENS_DUCK

    its = []
    prev = "base"
    for i in range(1, DOREMI_ITERS + 1):
        its.append(f""", it{i} AS (
  SELECT source, n_tokens, avg_nll_ppm, excess_ppm,
         greatest(w * (1000000 + {DOREMI_ETA_PPM} * excess_ppm // 1000000)
                  // 1000000, 1) AS w
  FROM {prev}
)""")
        prev = f"it{i}"
    return f"""
WITH toks AS (
  SELECT source, unnest({_TOKENS_DUCK}) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
), scored AS (
  SELECT source,
         CAST(floor(-ln(cnt::DOUBLE / total) * 1000000 + 0.5) AS BIGINT)
           AS nll_ppm
  FROM toks JOIN vocab USING (tok) CROSS JOIN tot
), src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(nll_ppm) AS BIGINT) AS s
  FROM scored GROUP BY 1
), g AS (
  SELECT CAST(sum(s) // sum(n_tokens) AS BIGINT) AS ref FROM src
), base AS (
  SELECT source, n_tokens,
         CAST(s // n_tokens AS BIGINT) AS avg_nll_ppm,
         CAST(s // n_tokens AS BIGINT) - ref AS excess_ppm,
         CAST(1000000 AS BIGINT) AS w
  FROM src CROSS JOIN g
){''.join(its)}, tw AS (
  SELECT CAST(sum(w) AS BIGINT) AS tw FROM {prev}
)
SELECT source, n_tokens, avg_nll_ppm, excess_ppm,
       CAST(w * 1000000 // tw AS BIGINT) AS weight_ppm
FROM {prev} CROSS JOIN tw
"""


DOREMI_WEIGHTS_SQL = _doremi_sql()
