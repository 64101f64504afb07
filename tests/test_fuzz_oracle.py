"""Randomized corpus differential: the oracle gate runs on ONE fixed
corpus per scale factor — this fuzzes the document-family queries on
hypothesis-generated corpora (forced exact dups, shared prefixes,
empty/short texts, single-token docs) and checks Spark against the
SAME registered DuckDB oracle SQL on each. Catches semantics drift the
fixed corpus can't reach (e.g. empty-shingle docs, all-duplicate
groups, single-source corpora)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import maillog2db_spark.queries as Q

# Mixed-case ASCII plus the engine-divergence traps: ΟΔΟΣ (Greek final
# sigma — full lowercasing is context-sensitive), İstanbul (Turkish
# dotted capital I — full lowercase emits an extra combining dot), and
# NFC vs NFD café (composition variants). The ASCII-only fold contract
# (dedup._TOKENS_*, textnorm.nfc_fold) exists precisely so these hash
# identically in Spark and DuckDB.
WORDS = [
    "alpha", "beta", "Gamma", "DELTA", "eps", "zeta", "eta", "theta",
    "\u039f\u0394\u039f\u03a3", "\u0130stanbul", "caf\u00e9", "cafe\u0301",
]

FUZZED_QUERIES = [
    "doc_exact_dedup",
    "doc_dedup_keep_best",
    "doc_normalized_dedup",
    "doc_shingle_novelty",
    "doc_unigram_lm_score",
    "doc_profile",
    # integral-output text ops (float-ppm ops stay out: engine-side
    # partial-sum ordering makes exact .5 rounding boundaries reachable
    # under fuzz, which would be false alarms, not bugs)
    "doc_language_id",
    "doc_langid_confusion",
    "doc_rolling_fingerprint",
    "doc_length_deciles",
    # real-codec multimodal ops: their oracles are arithmetic
    # predictions over text, and their definitions are deliberately
    # code-point/char-based — the non-ASCII WORDS certify that choice
    # cross-engine (rms stays in: both engines reduce bit-identical
    # integer partial sums, so the rounded double is the same object)
    "mm_png_roundtrip",
    # real lossy JPEG on the provably-lossless flat-block class: the
    # image derives from md5(text), so any fuzz text (unicode, empty,
    # NULL-ish) exercises the full DCT/Huffman path with an exact hash
    "mm_jpeg_roundtrip",
    "mm_wav_loudness",
    "mm_frame_sample",
    # color JPEG on the per-channel lossless grids — md5-derived MCUs,
    # so any fuzz text exercises the full 3-component MCU pipeline
    "mm_jpeg_color_roundtrip",
    # perceptual family: tiles/tones/frames all derive from md5(text),
    # so the oracle's arithmetic predictions hold for ANY text (the
    # sign-bit margins are properties of md5-uniform tiles, not of the
    # corpus); tiny corpora exercise few-pair and singleton-cluster
    # shapes on both engines
    "mm_phash_neardup",
    "mm_phash_clusters",
    "mm_audio_fingerprint",
    "mm_audio_neardup",
    "mm_video_phash",
    "mm_video_phash_neardup",
    # regex-dialect certifier: the derived contact block always
    # contains real matches; unicode fuzz text stresses the
    # byte-vs-char boundary behavior of both engines
    "doc_pii_scrub",
    # integral sketch with deterministic indexes; rank ties break on tok
    "doc_cms_heavy_hitters",
    # ppm-integral token features; empty-token docs exercise the
    # try_divide NULL-not-crash contract (ANSI divide-by-zero)
    "doc_token_stats",
    "doc_quality_score",
    # Gopher rule set: unicode fuzz text stresses the line-split +
    # regex dialects; empty-token docs hit the nullif mean guard and
    # the false-AND-NULL conjunction on both engines
    "doc_gopher_rules",
    # the \p{L} variant: the non-ASCII WORDS (café/İstanbul/ΟΔΟΣ and
    # the NFD combining accent) are exactly the class where Java regex
    # and RE2 must agree on the unicode letter category
    "doc_gopher_rules_unicode",
    # Table A1 repetition rows: dup-heavy fuzz corpora force repeated
    # lines/paragraphs; unicode text certifies the char-length
    # weighting and the trim/empty-segment filter agree cross-engine
    "doc_gopher_repetition",
    # C4 cleaning: fuzz lines rarely end in terminal punctuation, so
    # empty-kept (md5('') both engines) and the <3-sentence drop are
    # the hot paths; '{'-bearing and unicode lines certify the
    # contains/regex dialects
    "doc_c4_clean",
    # the composed funnel: all three families' flags must conjoin in
    # lockstep on the same degenerate corpora each family is fuzzed on
    "doc_quality_funnel",
    # CCNet terciles: tiny per-language groups hit the ntile ragged
    # fill; dup-heavy corpora force (avg_nll_ppm, doc_id) tie chains
    "doc_ccnet_buckets",
    "doc_bpe_token_stats",
    # unigram trainer: multi-byte chars reach the character-based
    # substring contract in both DP pyramids; dup-heavy tiny corpora
    # hit the add-one smoothing and the (score, piece-length) and
    # (cnt, piece) tie-break chains
    "doc_unigram_tokenizer",
    # encode path: a THIRD DP pyramid under the final model plus the
    # per-doc rollup join
    "doc_unigram_encode_stats",
    # fingerprint-keyed split (forced exact copies must co-locate)
    "doc_leakage_safe_split",
    # curriculum export: integral ordering over quality_ppm + md5
    # keys; tiny corpora hit the ntile ragged fill and NULL-quality
    # (empty-doc) coalesce on both engines
    "doc_curriculum_order",
    # sort-based blocking: binary UTF-8 key ordering must agree
    # cross-engine (non-ASCII WORDS reach multi-byte comparisons)
    "doc_sorted_neighborhood",
    # LSH recall contract: tiny fuzz corpora routinely have ZERO true
    # pairs (the vacuous-truth 1e6 branch) or all-identical reps;
    # forced copies collapse into reps so truth stays small and the
    # prefix-filter/banding comparison runs on degenerate shapes
    "doc_lsh_recall",
    # Efraimidis-Spirakis top-k: selection order (rounded key, doc_id
    # tiebreak) must agree cross-engine on duplicate-heavy corpora
    "doc_weighted_sample",
    # duplicate-span removal: forced exact copies + shared prefixes
    # reach all-removed docs (the empty-list stringify trap) and
    # overlapping-span merges
    "doc_span_scrub",
    # length-gated ExactSubstr variant: forced exact copies are the
    # only fuzz docs long enough to clear SPAN_MIN_TOKENS, so the
    # gate's HAVING boundary and the all-removed md5('') both fire
    "doc_span_dedup",
    # MOSS pair detection: forced exact copies collide on every
    # fingerprint (containment = 1e6); the stop-fingerprint cap and
    # the a<b dedup must agree cross-engine on dup-heavy corpora
    "doc_winnowing_overlap",
    # BPE training: duplicate-heavy corpora and non-ASCII symbols hit
    # the argmax tiebreak and the replace-trick application in lockstep
    "doc_bpe_train_merges",
    "doc_bpe_encode_stats",
    # WordPiece training: same trainer mechanics PLUS the likelihood
    # score's double-division argmax and the incremental unary table —
    # dup-heavy corpora force score ties broken on (l, r) in lockstep
    "doc_wordpiece_train",
    "doc_wordpiece_encode_stats",
    # RAKE: stopword-free fuzz corpora degenerate to whole-doc phrases
    # (degree = phrase length everywhere); dup-heavy corpora force
    # phrase-score ties broken on (phrase, phrase_id) in lockstep
    "doc_rake_keywords",
    # Zipf fit: per-term ln-fixed-point contributions (the
    # unigram_lm_score idiom — floored BEFORE summation, so no
    # partial-sum ordering risk); tiny vocabularies hit n_ranks < K
    # and the nullif degenerate-denominator guard on both engines
    "doc_zipf_fit",
    # interpolated bigram LM: single-token and empty docs must drop
    # identically; zipped-slice bigrams on duplicate-heavy corpora
    "doc_bigram_lm_score",
    # Kneser-Ney bigram perplexity: dup-heavy corpora push counts into
    # the discounted-mass branch (c - D vs the greatest(...) floor);
    # single-token/empty docs must drop identically; the 1-row ttypes
    # cross and the continuation counts must agree cross-engine
    "doc_kn_perplexity",
    # the trigram recursion: dup-heavy corpora exercise both discount
    # floors; docs of exactly 2 tokens must drop from the trigram
    # stream while still feeding the bigram-type level-1 tables
    "doc_kn3_perplexity",
    # held-out KN: the even/odd split on random corpora reaches every
    # backoff branch — unseen bigrams, unseen contexts, OOV targets
    # (NULL-skipped aggregation + the -1 sentinel) — in lockstep
    "doc_kn_heldout",
    # the KenLM-order cascade: docs of exactly 3/4 tokens must drop
    # from the 4-/5-gram streams while still feeding every lower-level
    # type table; dup-heavy corpora exercise all five discount floors
    "doc_kn4_perplexity",
    "doc_kn5_perplexity",
    # held-out order-5: the even/odd split reaches unseen contexts at
    # EVERY level of the deep cascade plus OOV targets (-1 sentinel)
    "doc_kn5_heldout",
    # min-k% tail of the same model: ceil tail sizing on 1-bigram docs
    # (tail == whole doc) and desc-NLL/pos tie-breaks on duplicate-
    # heavy corpora where many bigrams share one quantized NLL
    "doc_mink_prob",
    # cross-tokenizer fertility: the two encode paths' rollup must
    # agree cross-engine even when fuzz corpora collapse one path
    # (all-duplicate words → single-piece vocab)
    "doc_tokenizer_fertility",
    # char-entropy: per-term ppm quantization before the order-free
    # bigint sum; non-ASCII WORDS certify codepoint-level histograms
    # agree cross-engine (incl. the NFD combining accent)
    "doc_char_entropy",
    # PSI drift: dense bin grid + add-one smoothing; single-source
    # corpora must yield psi ≈ 0 rows, never division blowups
    "dq_length_drift_psi",
    # GD-trained classifier: integer features/gradients/weights and a
    # rational sigmoid — per-row rounding only, no cross-row float
    # sums, so the training trajectory is bit-identical cross-engine
    # even on degenerate corpora (all-one-source, empty texts)
    "doc_quality_classifier",
    # lossless length-band blocking + ASCII-projected Levenshtein: the
    # non-ASCII WORDS (incl. the combining accent) certify that byte-
    # (DuckDB) and codepoint- (Spark) distances coincide after the fold
    "doc_edit_distance_pairs",
    # BM25: tiny corpora can be ALL query docs (empty corpus side) —
    # the stats aggregate must NULL out, not blow up, on both engines;
    # per-term ppm quantization before integer sums
    "doc_bm25_topk",
    # source KL: single-source corpora have no pairs; all-empty-token
    # corpora have an EMPTY head (0 rows on both engines)
    "doc_source_kl",
    # first-occurrence bucket attribution; all-empty-token corpora keep
    # doc buckets but zero token/term mass
    "doc_vocab_growth",
    # sqrt-exact policy shares on degenerate single-source corpora
    "doc_source_temperature_mix",
    # linearized-Hedge trajectory: single-source corpora pin excess=0
    # (weights stay uniform); dup-heavy corpora push extreme excesses
    # through the greatest(...,1) clamp identically on both engines
    "doc_doremi_weights",
    # DSIR: fuzz corpora have NO bench-source docs (sources s0/s1), so
    # the target model is all-zero counts — pure-smoothing terms; empty
    # and single-token docs take the zero-filled left-join path
    "doc_dsir_weights",
    # epoch permutation: position/shard/slot layout must be identical
    # cross-engine on any corpus size (incl. 1-doc corpora, where every
    # epoch is a single rank block); md5-slice keys tie-break on doc_id
    "doc_epoch_shuffle",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            # + 0.0 canonicalizes IEEE negative zero: round(-1e-7, 6)
            # stringifies as "-0.0" in one engine and "0.0" in the other
            df[c] = df[c].round(9) + 0.0
    return df.astype(str).sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


corpus_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),  # token seq
        st.sampled_from(["en", "de"]),
        st.sampled_from(["s0", "s1"]),
        st.integers(0, 3),  # number of exact copies to force
    ),
    min_size=1,
    max_size=15,
)


@pytest.mark.parametrize("qname", FUZZED_QUERIES)
@settings(
    max_examples=5, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck)
)
@given(data=corpus_strategy)
def test_fuzzed_corpus_matches_oracle(spark, tmp_path_factory, qname, data):
    rows = []
    doc_id = 0
    for toks, lang, source, n_copies in data:
        text = " ".join(toks)
        for _ in range(1 + n_copies):
            rows.append((doc_id, text, lang, source, len(text)))
            doc_id += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("fuzz")
    df.coalesce(2).write.parquet(str(d / "documents.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


EV_QUERIES = [
    # bot scoring: tiny per-user event counts hit the n_gaps=0 NULL
    # rollup, all-zero gaps hit the nullif CV denominator, and the
    # flag's FALSE-AND-NULL three-valued logic must agree cross-engine
    "ev_bot_score",
    # CUSUM: single-day corpora (grid of 1, P_0-clamp at the first
    # row), exact-mean corpora (all deviations = -/+k), and the
    # prefix-min/max closed form vs the recursion on both engines
    "ev_changepoint_cusum",
    "ev_value_anomaly",
    "ev_top_users",
    "ev_tumbling_hourly",
    # the two round-2 gate failures (TIMESTAMP_NTZ handling) — fuzzed
    # so the regression class stays covered on arbitrary event shapes
    "ev_asof_purchase_click",
    "ev_pairs_within_5min",
    # RANGE frame: duplicate order keys make PEER rows — both engines
    # must include the full peer group in each other's frame
    "ev_trailing_7d_stats",
    # sweep-line depth over sessionized intervals (coincident
    # boundaries pre-aggregate, so ordering ties can't diverge)
    "ev_concurrent_sessions",
    # overlapping windows: epoch-aligned starts via integer-µs
    # arithmetic on both engines
    "ev_sliding_hourly",
    # transition matrix: lag ordering ties (same-ts events) break on
    # event_id identically; row normalization is exact-int division
    "ev_markov_transitions",
    # funnel stage latencies: users with clicks before any view, or
    # purchases without clicks, must fall out of both engines the same
    # way; percentile interpolation is midpoint IEEE both sides
    "ev_funnel_latency",
    # multi-touch credits: integer micro-division ties, negative
    # purchase values (both engines truncate toward zero), window-edge
    # gaps exactly at 30min
    "ev_multitouch_attribution",
    # robust MAD outliers: interpolated medians are single midpoint IEEE
    # ops, identical both engines; constant-valued types must drop via
    # the mad>0 guard + try_divide on both sides
    "ev_value_mad_anomaly",
]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),            # user_id
        st.sampled_from(["click", "view", "purchase"]),
        st.integers(0, 3_000_000),    # seconds offset from epoch base
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=4,
    max_size=40,
)


@pytest.mark.parametrize("qname", EV_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=events_strategy)
def test_fuzzed_events_match_oracle(spark, tmp_path_factory, qname, data):
    from pyspark.sql import functions as F

    rows = [
        (i, 1_700_000_000 + off, uid, et, float(v), "{}")
        for i, (uid, et, off, v) in enumerate(data)
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, epoch long, user_id long, event_type string, value double, props string"
        )
        # NTZ on disk — the driver's testdata shape; the loader casts it
        # back to LTZ under the UTC session, DuckDB reads it naive
        .withColumn("ts", F.timestamp_seconds(F.col("epoch")).cast("timestamp_ntz"))
        .drop("epoch")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    d = tmp_path_factory.mktemp("fuzz_ev")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


# CR/CRLF fuzz tier (advisor-found r9): the fixed corpus and the main
# corpus strategy carry no carriage returns, but Java-regex '$' matches
# before a trailing CR while RE2 matches only at end-of-string — the
# exact divergence class the C4 terminal-punctuation anchor sits on.
# Documents here are LINES joined by a fuzz-chosen separator (LF or
# CRLF), lines optionally ending in terminal punctuation, so the
# line-based quality family is exercised on CR-bearing text end to end.
CR_QUERIES = [
    "doc_c4_clean",
    "doc_c4_blocklist_clean",
    "doc_quality_funnel",
    "doc_gopher_rules",
    "doc_gopher_repetition",
]

crlf_corpus_strategy = st.lists(
    st.tuples(
        st.lists(  # lines: (words, terminal punctuation or none)
            st.tuples(
                st.lists(st.sampled_from(WORDS), min_size=0, max_size=8),
                st.sampled_from(["", ".", "!", "..."]),
            ),
            min_size=1,
            max_size=6,
        ),
        st.sampled_from(["\n", "\r\n"]),  # line separator
        st.booleans(),                      # trailing separator
        st.integers(0, 2),                  # forced exact copies
    ),
    min_size=1,
    max_size=8,
)


@pytest.mark.parametrize("qname", CR_QUERIES)
@settings(max_examples=5, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=crlf_corpus_strategy)
def test_fuzzed_crlf_corpus_matches_oracle(spark, tmp_path_factory, qname, data):
    rows = []
    doc_id = 0
    for lines, sep, trail, n_copies in data:
        text = sep.join(" ".join(ws) + punct for ws, punct in lines)
        if trail:
            text += sep
        for _ in range(1 + n_copies):
            rows.append((doc_id, text, "en", "s0", len(text)))
            doc_id += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("fuzz_crlf")
    df.coalesce(2).write.parquet(str(d / "documents.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


# zorder: pure integer interleave — fuzz reaches the bucket caps and
# pre-epoch-grid dates the fixed table can't
ORD_QUERIES = ["ord_rfm_segments", "ord_customer_gaps", "ord_zorder_key",
               # change-flag cumsum islands: same-date ties must order
               # on orderkey identically in both engines
               "ord_priority_islands",
               # integer cross-product class cuts; revenue ties rank on
               # custkey identically
               "ord_abc_pareto",
               # integer month arithmetic; single-order cohorts and
               # same-month repeat buyers
               "ord_cohort_ltv",
               # gap-aware decay: fuzz reaches sparse calendars and
               # same-day collisions the fixed table can't
               "ord_revenue_ewma",
               # sequential Holt fold vs recursive CTE: single-month
               # corpora exercise the base case (trend 0, fitted NULL)
               "ord_revenue_holt",
               # two-phase rank + integer ntile with total < bucket
               # count (q=0 branch must stay unevaluated on both sides)
               "ord_price_equidepth",
               # 2x12 centered MA over the dense month index: fuzz
               # reaches calendar gaps (RANGE vs rows semantics) and
               # sub-13-month spans (every ratio NULL, NULL means)
               "ord_seasonal_index"]

orders_strategy = st.lists(
    st.tuples(
        st.integers(0, 6),                 # custkey
        st.integers(0, 2_000),             # days offset for orderdate
        st.floats(1, 100_000, allow_nan=False, allow_infinity=False),
        st.sampled_from(["O", "F", "P"]),
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
    ),
    min_size=3,
    max_size=30,
)


@pytest.mark.parametrize("qname", ORD_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=orders_strategy)
def test_fuzzed_orders_match_oracle(spark, tmp_path_factory, qname, data):
    from pyspark.sql import functions as F

    rows = [
        (i, ck, status, round(float(p), 2), 1_500_000_000 + days * 86_400, prio)
        for i, (ck, days, p, status, prio) in enumerate(data)
    ]
    df = (
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, epoch long, o_orderpriority string",
        )
        .withColumn("o_orderdate", F.timestamp_seconds(F.col("epoch")).cast("timestamp_ntz"))
        .drop("epoch")
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
    )
    d = tmp_path_factory.mktemp("fuzz_ord")
    df.coalesce(1).write.parquet(str(d / "orders.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'")
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


# --- embeddings family fuzzer ------------------------------------------------
#
# The fixed embeddings tables are uniform random — no zero vectors, no
# exact duplicates, no degenerate cells. This tier plants exactly those:
# a zero vector makes every cosine division 0/0, which under Spark 4
# ANSI mode is a query-killing error unless the operator uses
# try_divide (the fix this tier pins), while DuckDB yields NULL and
# filters the row.

EMBED_QUERIES = [
    "embed_knn_bruteforce",
    # hard negatives: all-one-label corpora must give 0 rows on both
    # engines; zero vectors hit try_divide NULL cosines under the
    # label-mismatch filter; dup vectors force cosine ties on id
    "embed_hard_negatives",
    # MMR greedy trajectory: dup vectors make sim ties the greedy
    # argmax must break on doc_id in lockstep for FIVE chained steps;
    # zero vectors ride the sentinel ppm; pools smaller than K drain
    # both engines to the same short selection
    "embed_mmr_rerank",
    "embed_lsh_buckets",
    "embed_cosine_neardup",
    "embed_semdedup",
    "embed_label_centroids",
    "embed_quantize_int8",
    "embed_covariance",
    "embed_topk_per_label",
    # fixed-trajectory Lloyd's: distance ties between unit/dup vectors
    # must break on cell id identically through BOTH unrolled iterations
    "embed_kmeans",
    # per-subspace argmin ties (zero/unit subvectors) break on code id
    "embed_pq_encode",
    # table-lookup sums over degenerate codebooks; rank ties on distance
    "embed_pq_adc_topk",
    # composed coarse-cell + residual-PQ path: zero/dup vectors hit NULL
    # csim cell assignment AND integer-ppm residual quantization at once
    "embed_ivfpq_topk",
    # prefix-truncated vs full ranking: zero PREFIXES of nonzero vectors
    # hit try_divide NULLs in only one of the two rankings
    "embed_truncation_recall",
    # simplified silhouette: zero vectors give a=b=0 -> NULL score via
    # try_divide; single-label corpora have no second centroid (b NULL,
    # n_scored 0, NULL mean — never a divide error)
    "embed_silhouette",
    # sign-sketch ANN: zero vectors sign-quantize to the all-zero
    # signature (Hamming ties break on id) and hit try_divide NULL
    # cosine in the rerank; dup_prev vectors force Hamming-0 ties
    "embed_hamming_topk",
    "embed_hamming_recall",
    # int8 grid: zero vectors have scale 0 (reconstruct to all-zero,
    # NULL cosine on the q8 side only); unit vectors saturate at ±127
    "embed_int8_recall",
    # StandardScaler: quantize-then-sum exact moments; constant dims
    # (all-dup corpora) hit the zero-variance nullif on both engines
    "embed_standard_scaler",
    # greedy k-center: dup vectors force dissim-0 and argmax ties on
    # vec_id through EIGHT chained steps; zero vectors ride the
    # sentinel (maximally far — selected early, a good property);
    # 8-vector corpora drain the candidate set exactly at K
    "embed_kcenter_coreset",
]

vec_strategy = st.lists(
    st.tuples(
        st.sampled_from(["unit", "zero", "dup_prev", "mixed"]),
        st.integers(0, 63),   # which axis for unit vectors
        st.integers(0, 4),    # label
    ),
    min_size=8,
    max_size=24,
)


@pytest.mark.parametrize("qname", EMBED_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=vec_strategy)
def test_fuzzed_embeddings_match_oracle(spark, tmp_path_factory, qname, data):
    rows = []
    prev = [1.0] + [0.0] * 63
    for i, (kind, axis, label) in enumerate(data):
        if kind == "zero":
            v = [0.0] * 64
        elif kind == "unit":
            v = [0.0] * 64
            v[axis] = 1.0
        elif kind == "dup_prev":
            v = list(prev)
        else:  # mixed: deterministic small dense vector
            v = [((i * 31 + d * 7) % 13 - 6) / 10.0 for d in range(64)]
        prev = v
        rows.append((i, v, label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = tmp_path_factory.mktemp("efuzz")
    df.coalesce(2).write.parquet(str(d / "embeddings.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


# --- lineitem family fuzzer --------------------------------------------------

LI_QUERIES = [
    "li_basket_affinity",
    # ppb-integer power iterations: singleton baskets (no edges) and
    # duplicate (order, part) rows must collapse identically
    "li_part_pagerank",
    # directed confidence: both orientations of every pair, exact-ppm
    # integer ratios
    "li_basket_rules",
    # oriented wedge join: duplicate (order, part) rows collapse first;
    # edgeless graphs (singleton baskets) give 0 rows on both engines
    "li_copurchase_triangles",
    # star contraction vs the recursive-reachability oracle on fuzzed
    # graphs; empty/thresholded-away edge sets give 0 rows both sides
    "li_part_components",
    # fixed-round peel vs the unrolled materialized rounds; fuzz graphs
    # routinely peel to EMPTY cores (0 rows on both engines)
    "li_part_kcore",
    # Croston fold vs the recursive-CTE trajectory: fuzzed monthly
    # spines hit first-demand-at-month-1, long leading-zero runs, and
    # single-demand parts (forecast = qty/interval) in lockstep
    "li_part_croston",
]

basket_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),    # orderkey — few orders force co-occurrence
        st.integers(0, 7),    # partkey — small catalog forces support >= 2
    ),
    min_size=4,
    max_size=60,
)


@pytest.mark.parametrize("qname", LI_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=basket_strategy)
def test_fuzzed_lineitem_matches_oracle(spark, tmp_path_factory, qname, data):
    rows = [
        # the ~23-day stride spreads rows over months so the Croston
        # spine is genuinely intermittent; the graph queries ignore dates
        (ok, pk, 1, i, 1.0 + (i % 5), 10.0, 0.0, 0.0, "N", "O",
         1_500_000_000 + i * 2_000_000)
        for i, (ok, pk) in enumerate(data)
    ]
    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, epoch long",
        )
        .withColumn("l_shipdate", F.timestamp_seconds(F.col("epoch")).cast("timestamp_ntz"))
        .drop("epoch")
    )
    d = tmp_path_factory.mktemp("fuzz_li")
    df.coalesce(1).write.parquet(str(d / "lineitem.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet/*.parquet'")
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname


# --- cross-table (documents ⋈ embeddings) fuzzer ------------------------------
#
# embed_semdedup_keep_best joins the two corpora on vec_id = doc_id —
# neither single-table fuzzer can reach it. This tier generates BOTH:
# degenerate vectors (zero/unit/dup) drive the dedup side into NULL
# cosines and forced duplicate groups, while the derived text column
# (deterministic function of the vector spec) gives every doc a
# quality score the argmax policy must rank identically cross-engine.

CROSS_QUERIES = [
    "embed_semdedup_keep_best",
    # RRF fusion: tiny corpora force empty sides (all docs are queries
    # → empty lexical corpus must NULL out, not blow up; zero vectors →
    # NULL cosines whose DESC ordering must agree cross-engine), and
    # the dup-heavy text makes tied BM25 scores exercise the doc_id
    # tiebreak in both rankers and the fusion
    "doc_hybrid_rrf_topk",
    # cluster labeling: degenerate vectors force assignment ties (the
    # cell tiebreak must agree with the kmeans trajectory on both
    # engines) and the short dup-heavy texts hit the n_ct floor and
    # the (lift, n_ct, term) tiebreak chain
    "embed_cluster_labels",
    # eval grid: tiny corpora make whole systems retrieve nothing
    # (zero-filled rows), tied scores walk the doc_id tiebreaks, and
    # the grid must stay complete on both engines
    "doc_retrieval_label_eval",
]


@pytest.mark.parametrize("qname", CROSS_QUERIES)
@settings(max_examples=4, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(data=vec_strategy)
def test_fuzzed_cross_table_matches_oracle(spark, tmp_path_factory, qname, data):
    erows, drows = [], []
    prev = [1.0] + [0.0] * 63
    for i, (kind, axis, label) in enumerate(data):
        if kind == "zero":
            v = [0.0] * 64
        elif kind == "unit":
            v = [0.0] * 64
            v[axis] = 1.0
        elif kind == "dup_prev":
            v = list(prev)
        else:
            v = [((i * 31 + d * 7) % 13 - 6) / 10.0 for d in range(64)]
        prev = v
        erows.append((i, v, label))
        # deterministic text whose quality varies with the spec: dup
        # vectors get LONGER, more diverse text than their originals,
        # so the quality argmax must genuinely override first-writer
        text = " ".join(WORDS[(i * 7 + k) % len(WORDS)] for k in range(2 + (i % 6)))
        drows.append((i, text, "en", f"s{label}", len(text)))
    d = tmp_path_factory.mktemp("xfuzz")
    spark.createDataFrame(
        erows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.parquet(str(d / "embeddings.parquet"))
    spark.createDataFrame(
        drows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.parquet(str(d / "documents.parquet"))

    got = Q.queries()[qname](spark, str(d)).toPandas()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = con.sql(Q.oracle_sql()[qname]).df()

    assert len(got) == len(want), (qname, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), qname
    assert _hash(_normalize(got)) == _hash(_normalize(want)), qname
