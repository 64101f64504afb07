"""The composed LLM-corpus pipeline: quality filter → canonicalized
dedup → benchmark decontamination → chunk/pack accounting, as ONE
DataFrame chain with per-stage survivor counts.

The individual operators each have their own oracle-gated query; this
is the COMPOSITION — what a user actually runs — and its per-stage
funnel is the artifact a data team reviews before a training run. The
near-dup stage runs as substring-novelty attribution (first-writer-
wins per shingle — SQL-tractable, so the funnel stays fully oracle-
checked); the MinHash/SimHash pair generators plug into the same slot
and are gated separately by doc_neardup_pairs / doc_simhash_neardup.

Everything is one lazy DAG: Catalyst shares the documents scan across
stages, the counts are independent aggregates unioned at the end, and
every stage predicate is a pure function of the row (content-hash
uniforms, integer ppm thresholds) — the whole funnel is deterministic
under repartition, AQE, and replay.

Scale notes: stage filters are narrowing, so each successive stage
scans fewer rows; the only shuffles are exact-dedup's fingerprint
groupBy and the tiny broadcast of benchmark shingles; chunk/bin counts
are closed-form per row (no explode materialization just to count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from .chunking import CHUNK_STRIDE, PACK_BUDGET
from .decontam import BENCH_SOURCE, CONTAM_PPM_THRESHOLD
from .dedup import _SHINGLES_DUCK, _SHINGLES_FROM_TOKS_SPARK, _TOKENS_DUCK, _TOKENS_SPARK

QUALITY_MIN_PPM = 620_000  # drops the bottom ~decile of this corpus' score range


def _quality_ppm_from_toks() -> "F.Column":
    # try_divide: empty-token docs score NULL (oracle: x/0 -> NULL)
    # and fall out of the quality stage on both engines — never crash
    avg_len = F.try_divide(
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        F.size("toks"),
    )
    uniq_ratio = F.try_divide(F.size(F.array_distinct("toks")), F.size("toks"))
    len_score = F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    shape_score = F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(avg_len - 5.0) / F.lit(5.0))
    score = 0.3 * len_score + 0.4 * uniq_ratio + 0.3 * shape_score
    return F.floor(score * 1_000_000 + 0.5).cast("bigint")


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts for the composed pipeline.

    Plan shape (round-4 restructure): ONE checkpointed base carries the
    materialized token/shingle arrays; each policy stage derives only a
    narrow SURVIVOR-ID or DROP-ID set (dedup reps, novelty drops,
    contamination hits), and the funnel is a single conditional
    aggregate over the corpus LEFT-JOINED with those id sets — plus one
    small window branch for pack bins. Compared to the previous
    stage-by-stage form this removes three full-width localCheckpoint
    materializations (each wrote every surviving row's token AND
    shingle arrays to local storage just to count later stages) and
    five of the seven union branches; at 100 TB the difference is three
    fewer corpus-size writes. Measured 3.1 → 2.6 s warm at sf0.1 with
    byte-identical output."""
    # tokens come from the session-cached _doc_toks base (tokenize once
    # per session, r10 — the doc-grain attribute join is cheap and AQE
    # broadcasts the narrow documents side); shingles and the quality
    # score are materialized ONCE in the checkpointed base and every
    # consumer (quality, fingerprint, both shingle stages) reads the
    # same arrays instead of re-deriving
    from .dedup import _doc_toks

    d = (
        _doc_toks(spark, sf_dir)
        .join(
            io.load(spark, sf_dir, "documents").select(
                "doc_id", "lang", "source", "n_chars"
            ),
            "doc_id",
        )
        .withColumn("quality_ppm", _quality_ppm_from_toks())
        .withColumn("sh", F.expr(_SHINGLES_FROM_TOKS_SPARK))
        .localCheckpoint(eager=False)  # shared by every branch below
    )
    corpus = d.filter(F.col("source") != BENCH_SOURCE)
    quality = corpus.filter(F.col("quality_ppm") >= QUALITY_MIN_PPM)

    # canonicalized dedup: fingerprint = sorted distinct token set, so
    # reordered/whitespace-variant copies collapse (byte-exact dedup is
    # doc_exact_dedup's separate gate; this corpus has no byte dups but
    # 51 token-set dups at sf0.01). Keep the min-doc_id representative.
    fp = quality.withColumn(
        "fingerprint",
        F.md5(F.array_join(F.array_sort(F.array_distinct("toks")), " ")),
    )
    # r10: the survivor-id sets below are narrow (one bigint per doc)
    # but their AGGREGATE SUBTREES were re-planned at every consumer —
    # ids_dedup appears in deduped/ids_novel/flags, dupish in
    # ids_novel/flags — compounding to a 321-node, 112-Exchange plan.
    # Lazy checkpoints collapse each id set to one materialization per
    # action (first consumer computes it); at 100 TB these are
    # survivor-count bigint lists, never corpus-width rows.
    ids_dedup = (
        fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
        .localCheckpoint(eager=False)
    )
    deduped = fp.join(ids_dedup, "doc_id", "left_semi")

    # novelty + decontamination FUSED over ONE shingle explode (r11,
    # guide §2.4): the two stages previously exploded the survivor
    # shingles twice (novelty over `deduped`, contamination over
    # `novel`) and paid [shingle groupBy + join-back + doc groupBy] +
    # [semi-join + explode + semi-join + doc groupBy]. One pass now
    # carries first-writer attribution (window min over the shingle —
    # the same exchange the groupBy+join-back needed, minus the join
    # stage) AND the benchmark-hit flag, and ONE doc-grain aggregate
    # yields (n_sh, n_seen, n_hit). Computing n_hit for dup-ish docs
    # too is value-identical: the funnel reads the contamination flag
    # only under is_novel, and for every novel doc the shingle set —
    # hence the hit count — is unchanged. Docs too short to shingle
    # carry no evidence and pass through, as before.
    bench = (
        d.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    ex = deduped.select("doc_id", F.explode("sh").alias("shingle"))
    per_doc = (
        ex.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("shingle"))
        )
        .join(F.broadcast(bench.withColumn("bh", F.lit(1))), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)).alias("n_seen"),
            F.count("bh").alias("n_hit"),
        )
        .localCheckpoint(eager=False)  # consumed by dupish AND hits
    )
    dupish = (
        per_doc.filter(F.col("n_seen") * 2 >= F.col("n_sh")).select("doc_id")
    )
    ids_novel = ids_dedup.join(dupish, "doc_id", "left_anti")
    hits = (
        per_doc.filter(
            F.col("n_hit") * 1_000_000 >= F.col("n_sh") * CONTAM_PPM_THRESHOLD
        ).select("doc_id")
    )

    # the funnel as ONE conditional aggregate over flag joins (id sets
    # are survivor-scale — shuffle joins, AQE broadcasts them when
    # small; never forced, so the plan stays honest at 100 TB)
    flags = (
        corpus.select("doc_id", "lang", "n_chars", "quality_ppm")
        .join(ids_dedup.withColumn("f_d", F.lit(1)), "doc_id", "left")
        .join(dupish.withColumn("f_dup", F.lit(1)), "doc_id", "left")
        .join(hits.withColumn("f_c", F.lit(1)), "doc_id", "left")
        # narrow doc-grain flag table, read by BOTH the funnel aggregate
        # and the pack-bin window — one materialization per action (r10)
        .localCheckpoint(eager=False)
    )
    q_ok = F.col("quality_ppm") >= QUALITY_MIN_PPM
    is_dedup = F.col("f_d").isNotNull()
    is_novel = is_dedup & F.col("f_dup").isNull()
    is_clean = is_novel & F.col("f_c").isNull()
    n_chunks_col = F.expr(f"(greatest(n_chars, 1) - 1) div {CHUNK_STRIDE} + 1")
    one = F.lit(1)
    zero = F.lit(0)
    # coalesce: F.sum over ZERO rows is NULL, but these are counts —
    # an empty corpus must report 0 like the oracle's count(*) and the
    # streaming admission funnel's counters, not NULL
    def cnt(cond, val=one):
        return F.coalesce(F.sum(F.when(cond, val).otherwise(zero)), F.lit(0)).cast(
            "bigint"
        )

    agg = flags.agg(
        F.count(one).cast("bigint").alias("n1"),
        cnt(q_ok).alias("n2"),
        cnt(is_dedup).alias("n3"),
        cnt(is_novel).alias("n4"),
        cnt(is_clean).alias("n5"),
        cnt(is_clean, n_chunks_col).alias("n6"),
    )

    # pack bins need the running token sum over clean rows — the one
    # branch a flat aggregate can't express
    tok = F.expr("(n_chars + 3) div 4")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    bins = (
        flags.filter(is_clean)
        .select("lang", "doc_id", F.floor(F.coalesce(F.sum(tok).over(w), F.lit(0)) / PACK_BUDGET).alias("bin_id"))
        .select("lang", "bin_id")
        .distinct()
        .agg(F.count(one).cast("bigint").alias("n7"))
    )

    return (
        agg.join(bins)
        .selectExpr(
            "stack(7, '1_corpus', n1, '2_quality', n2, '3_dedup_canonical', n3, "
            "'4_novelty', n4, '5_decontaminated', n5, '6_chunks', n6, "
            "'7_pack_bins', n7) AS (stage, n)"
        )
        .orderBy("stage")
    )


CORPUS_PIPELINE_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, source, text, n_chars, {_TOKENS_DUCK} AS toks
  FROM documents
), scored AS (
  SELECT *, CAST(floor((0.3 * least(n_chars / 400.0, 1.0)
            + 0.4 * (len(list_distinct(toks))::DOUBLE / len(toks))
            + 0.3 * greatest(0.0, 1.0 - abs(list_sum(list_transform(toks,
                      x -> CAST(length(x) AS DOUBLE))) / len(toks) - 5.0) / 5.0))
            * 1000000 + 0.5) AS BIGINT) AS quality_ppm
  FROM base
), corpus AS (
  SELECT * FROM scored WHERE source <> '{BENCH_SOURCE}'
), quality AS (
  SELECT * FROM corpus WHERE quality_ppm >= {QUALITY_MIN_PPM}
), fp AS (
  SELECT *, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
  FROM quality
), deduped AS (
  SELECT * FROM fp q
  WHERE doc_id = (SELECT min(doc_id) FROM fp q2 WHERE q2.fingerprint = q.fingerprint)
), dd_sh AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS sh FROM documents
  WHERE doc_id IN (SELECT doc_id FROM deduped)
), sh_first AS (
  SELECT shingle, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM dd_sh) GROUP BY shingle
), dupish AS (
  SELECT doc_id FROM (
    SELECT s.doc_id, count(*) AS n_sh,
           sum(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS n_seen
    FROM (SELECT doc_id, unnest(sh) AS shingle FROM dd_sh) s
    JOIN sh_first f USING (shingle)
    GROUP BY s.doc_id
  ) WHERE n_seen * 2 >= n_sh
), novel AS (
  SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM dupish)
), bench AS (
  SELECT DISTINCT unnest(sh) AS shingle
  FROM (SELECT {_SHINGLES_DUCK} AS sh FROM documents WHERE source = '{BENCH_SOURCE}')
), doc_sh AS (
  SELECT doc_id, sh FROM dd_sh
  WHERE doc_id IN (SELECT doc_id FROM novel)
), contaminated AS (
  SELECT doc_id FROM (
    SELECT doc_id, n_sh, count(*) AS n_hit
    FROM (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM doc_sh)
    WHERE shingle IN (SELECT shingle FROM bench)
    GROUP BY doc_id, n_sh
  ) WHERE n_hit * 1000000 >= n_sh * {CONTAM_PPM_THRESHOLD}
), clean AS (
  SELECT * FROM novel WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), bins AS (
  SELECT DISTINCT lang,
         CAST(floor(COALESCE(sum((n_chars + 3) // 4) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_BUDGET})
           AS BIGINT) AS bin_id
  FROM clean
)
SELECT * FROM (
  SELECT '1_corpus' AS stage, CAST(count(*) AS BIGINT) AS n FROM corpus
  UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT) FROM quality
  UNION ALL SELECT '3_dedup_canonical', CAST(count(*) AS BIGINT) FROM deduped
  UNION ALL SELECT '4_novelty', CAST(count(*) AS BIGINT) FROM novel
  UNION ALL SELECT '5_decontaminated', CAST(count(*) AS BIGINT) FROM clean
  UNION ALL SELECT '6_chunks',
    CAST(COALESCE(sum((greatest(n_chars, 1) - 1) // {CHUNK_STRIDE} + 1), 0) AS BIGINT) FROM clean
  UNION ALL SELECT '7_pack_bins', CAST(count(*) AS BIGINT) FROM bins
) ORDER BY stage
"""
