"""Invariant tests for operators/corpus_analytics.py — properties the
oracle differential can't express (model-level identities, policy
consistency with the dedup family, quartile balance)."""

from __future__ import annotations

import math


from maillog2db_spark import io
from maillog2db_spark.operators import corpus_analytics as ca
from maillog2db_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def test_unigram_lm_score_matches_local_model(spark):
    """The distributed score equals a single-process recomputation of
    the same unigram MLE model (token-exact, ppm-exact)."""
    docs = {
        r["doc_id"]: r["text"]
        for r in io.load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    from collections import Counter

    tok = lambda t: [x for x in t.lower().strip().split() if x]
    vocab: Counter = Counter()
    for t in docs.values():
        vocab.update(tok(t))
    total = sum(vocab.values())
    expected = {}
    for d, t in docs.items():
        toks = tok(t)
        if not toks:
            continue
        ppm = [math.floor(-math.log(vocab[x] / total) * 1_000_000 + 0.5) for x in toks]
        expected[d] = (len(toks), sum(ppm), sum(ppm) // len(toks))

    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_nll_ppm"], r["avg_nll_ppm"])
        for r in ca.unigram_lm_score(spark, SF).collect()
    }
    assert got == expected


def test_shingle_novelty_matches_local_recomputation(spark):
    """The distributed first-writer-wins attribution equals a
    single-process recomputation over the whole sf0.001 corpus."""
    docs = {
        r["doc_id"]: r["text"]
        for r in io.load(spark, SF, "documents").select("doc_id", "text").collect()
    }

    def shingles(t: str) -> set:
        toks = [x for x in t.lower().strip().split() if x]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    first: dict = {}
    for d in sorted(docs):
        for sh in shingles(docs[d]):
            first.setdefault(sh, d)
    expected = {}
    for d in sorted(docs):
        sh = shingles(docs[d])
        if not sh:
            continue
        n_seen = sum(1 for s in sh if first[s] < d)
        n = len(sh)
        expected[d] = (
            n,
            n_seen,
            math.floor((n - n_seen) * 1_000_000.0 / n + 0.5),
            n_seen * 2 >= n,
        )

    got = {
        r["doc_id"]: (r["n_shingles"], r["n_seen"], r["novel_ppm"], r["dup_candidate"])
        for r in ca.shingle_novelty(spark, SF).collect()
    }
    assert got == expected
    lowest = min(got)
    assert got[lowest][1] == 0 and got[lowest][2] == 1_000_000


def test_dedup_keep_best_one_keeper_per_group(spark):
    """Exactly one keep per (lang, fingerprint) group; the keeper has
    the group's max n_chars; total keepers == exact_dedup row count."""
    rows = ca.dedup_keep_best(spark, SF).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[(r["lang"], r["fingerprint"])].append(r)
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in io.load(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    for g in groups.values():
        keeps = [r for r in g if r["keep"]]
        assert len(keeps) == 1
        assert n_chars[keeps[0]["doc_id"]] == max(n_chars[r["doc_id"]] for r in g)
        assert all(r["group_size"] == len(g) for r in g)
    assert len(groups) == dedup.exact_dedup(spark, SF).count()


def test_source_overlap_symmetric_bounds(spark):
    """Jaccard ≤ containment ≤ 1; n_common bounded by both sides."""
    for r in ca.source_overlap(spark, SF).collect():
        assert r["src_a"] < r["src_b"]
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard_ppm"] <= r["containment_a_ppm"] <= 1_000_000


def test_topk_per_label_ranks_and_membership(spark):
    """Each label yields exactly k ranked rows, ranks contiguous,
    cosines non-increasing, and every vec belongs to the label."""
    labels = {
        r["vec_id"]: r["label"]
        for r in io.load(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    by_label = {}
    for r in ca.topk_per_label(spark, SF).collect():
        by_label.setdefault(r["label"], []).append(r)
        assert labels[r["vec_id"]] == r["label"]
    for lbl, rows in by_label.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, ca.TOPK_PER_LABEL + 1))
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)


def test_value_anomaly_zscores(spark):
    """Every reported row clears the 3-sigma cut; recomputing the
    population z locally agrees within rounding."""
    e = io.load_events(spark, SF).select("event_id", "event_type", "value").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for r in e:
        vals[r["event_type"]].append(r["value"])
    stats = {
        t: (sum(v) / len(v), math.sqrt(sum((x - sum(v) / len(v)) ** 2 for x in v) / len(v)))
        for t, v in vals.items()
    }
    rows = ca.value_anomaly(spark, SF).collect()
    for r in rows:
        mu, sd = stats[r["event_type"]]
        assert abs(r["z"]) > ca.ANOMALY_Z
        assert abs(r["z"] - (r["value"] - mu) / sd) < 1e-3


def test_rfm_quartiles_balanced(spark):
    """ntile(4) splits customers as evenly as possible; segment code
    recombines the three quartiles."""
    rows = ca.rfm_segments(spark, SF).collect()
    n = len(rows)
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = [sum(1 for r in rows if r[col] == q) for q in (1, 2, 3, 4)]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert r["segment"] == r["r_quartile"] * 100 + r["f_quartile"] * 10 + r["m_quartile"]


def test_normalized_dedup_groups_unicode_variants(spark, tmp_path):
    """NFC + ASCII-fold canonicalization groups composition and
    ASCII-case variants that plain exact dedup keeps apart, and both
    engines compute the identical normalized fingerprints \u2014 including
    on the texts where full Unicode lowercasing diverges between
    engines (Greek final sigma, Turkish dotted capital I), which is
    exactly why the contract restricts case folding to ASCII."""
    import duckdb

    from maillog2db_spark.operators import dedup as dd
    from maillog2db_spark.operators import textnorm as tn

    import unicodedata

    nfc_e = unicodedata.normalize("NFC", "caf\u00e9 bistro")  # precomposed
    nfd_e = unicodedata.normalize("NFD", nfc_e)  # e + combining acute
    assert nfc_e != nfd_e  # genuinely different bytes
    title = "Caf\u00e9 Bistro"  # ASCII-case variant (C, B upper)
    rows = [
        (0, nfc_e, "fr", "s0", len(nfc_e)),
        (1, nfd_e, "fr", "s0", len(nfd_e)),
        (2, title, "fr", "s0", len(title)),
        (3, "\u039f\u0394\u039f\u03a3 sign", "el", "s1", 9),  # \u039f\u0394\u039f\u03a3: final-sigma trap
        (4, "\u0130stanbul", "tr", "s1", 9),  # \u0130: dotted-capital-I trap
        (5, "completely different", "en", "s1", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    norm = {r.norm_fingerprint: (r.rep_doc_id, r.n_copies)
            for r in tn.normalized_dedup(spark, sf).collect()}
    # the three caf\u00e9 variants collapse to ONE group under normalization
    # (NFC unifies 0/1; ASCII fold unifies 2); the non-ASCII-cased texts
    # stay distinct singletons...
    assert len(norm) == 4
    assert (0, 3) in norm.values()
    # ...while byte-exact dedup sees six distinct texts
    assert dd.exact_dedup(spark, sf).count() == 6

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(tn.NORMALIZED_DEDUP_SQL).fetchall()
    }
    # the cross-engine assertion: identical fingerprints even for the
    # sigma/\u0130 rows where str.lower() vs utf8proc lower() disagree
    assert want == norm


def test_corpus_pipeline_empty_corpus_counts_zero(spark, tmp_path):
    """Review regression: F.sum over zero rows is NULL — a documents
    table whose every row is the benchmark source (empty corpus) must
    still report integer 0 for stages 2-6 on BOTH engines, like the
    streaming admission counters do."""
    import duckdb

    from maillog2db_spark.operators.corpus_pipeline import CORPUS_PIPELINE_SQL, corpus_pipeline
    from maillog2db_spark.operators.decontam import BENCH_SOURCE

    rows = [(i, f"bench text {i} alpha beta", "en", BENCH_SOURCE, 20) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.stage: r.n for r in corpus_pipeline(spark, str(tmp_path)).collect()}
    assert got == {
        "1_corpus": 0, "2_quality": 0, "3_dedup_canonical": 0,
        "4_novelty": 0, "5_decontaminated": 0, "6_chunks": 0, "7_pack_bins": 0,
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'")
    want = {r[0]: r[1] for r in con.sql(CORPUS_PIPELINE_SQL).fetchall()}
    assert want == got


def test_bigram_lm_score_matches_local_model(spark):
    """The distributed interpolated-bigram score equals a single-process
    recomputation of the same Jelinek–Mercer model (ppm-exact); docs
    with fewer than two tokens are absent."""
    docs = {
        r["doc_id"]: r["text"]
        for r in io.load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    from collections import Counter

    tok = lambda t: [x for x in t.lower().strip().split() if x]
    vocab: Counter = Counter()
    bgc: Counter = Counter()
    ctx: Counter = Counter()
    for t in docs.values():
        ts = tok(t)
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bgc[(a, b)] += 1
            ctx[a] += 1
    total = sum(vocab.values())
    lam = ca.BIGRAM_LAMBDA
    expected = {}
    for d, t in docs.items():
        ts = tok(t)
        if len(ts) < 2:
            continue
        ppm = [
            math.floor(
                -math.log(lam * (bgc[(a, b)] / ctx[a]) + (1 - lam) * (vocab[b] / total))
                * 1_000_000
                + 0.5
            )
            for a, b in zip(ts, ts[1:])
        ]
        expected[d] = (len(ppm), sum(ppm), sum(ppm) // len(ppm))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_nll_ppm"], r["avg_nll_ppm"])
        for r in ca.bigram_lm_score(spark, SF).collect()
    }
    assert got == expected


def test_part_pagerank_matches_local_power_iteration(spark):
    """The distributed 2-step PageRank equals a single-process
    recomputation (ppb-exact), rank mass stays within rounding slack
    of 1e9, and higher-degree hubs outrank leaves on average."""
    from collections import defaultdict

    li = {
        (r.l_orderkey, r.l_partkey)
        for r in io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    }
    baskets: dict = defaultdict(set)
    for ok, pk in li:
        baskets[ok].add(pk)
    w: dict = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                w[(pa, pb)] += 1
    edges = defaultdict(list)
    for (pa, pb), ww in w.items():
        edges[pa].append((pb, ww))
        edges[pb].append((pa, ww))
    wout = {u: sum(ww for _, ww in vs) for u, vs in edges.items()}
    n = len(edges)
    pr = {u: math.floor(1e9 / n + 0.5) for u in edges}
    for _ in range(ca.PAGERANK_ITER):
        s: dict = defaultdict(int)
        for u, vs in edges.items():
            for v, ww in vs:
                s[v] += math.floor(0.85 * pr[u] * ww / wout[u] + 0.5)
        pr = {u: math.floor(0.15 * 1e9 / n + 0.5) + s[u] for u in edges}

    got = {r.part_id: r.pr_ppb for r in ca.part_pagerank(spark, SF).collect()}
    assert got == pr
    assert abs(sum(got.values()) - 1_000_000_000) <= 2 * n  # rounding slack
