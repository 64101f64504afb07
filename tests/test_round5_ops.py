"""Round-5 operator tests: BM25 retrieval, source KL, co-purchase
triangles, Heaps vocabulary growth, Holt smoothing — each checked
against an independent pure-Python recomputation at sf0.001 (the same
differential discipline as test_corpus_analytics; the sf0.01 DuckDB
oracle is the driver's gate, this is the local one)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

from maillog2db_spark.operators import corpus_analytics as ca
from maillog2db_spark.operators import text as tx
from maillog2db_spark.operators import windows as win

SF = "/root/testdata/sf0.001"

_AZ_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LO = "abcdefghijklmnopqrstuvwxyz"


def _tokens(text: str) -> list[str]:
    t = text.strip().translate(str.maketrans(_AZ_UP, _AZ_LO))
    return [w for w in re.split(r"\s+", t) if w]


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_bm25_matches_local_model(spark):
    rows = {
        (r.query_id, r.doc_id): (r.bm25_ppm, r.rank)
        for r in tx.bm25_topk(spark, SF).collect()
    }
    docs = _docs()
    corpus = {d: _tokens(t) for d, t, _ in docs if d >= tx.BM25_N_QUERIES}
    corpus = {d: t for d, t in corpus.items() if t}
    dl = {d: len(t) for d, t in corpus.items()}
    n = len(dl)
    avgdl = float(sum(dl.values())) / n
    dfreq = Counter()
    tf = {d: Counter(t) for d, t in corpus.items()}
    for d, c in tf.items():
        dfreq.update(c.keys())
    inverted = defaultdict(list)
    for d, c in tf.items():
        for term in c:
            inverted[term].append(d)
    expected = {}
    for q, t, _ in docs:
        if q >= tx.BM25_N_QUERIES:
            continue
        scores = Counter()
        for term in set(_tokens(t)):
            if term not in dfreq:
                continue
            df = dfreq[term]
            idf = math.log((float(n) - df + 0.5) / (df + 0.5) + 1.0)
            for d in inverted[term]:
                f = tf[d][term]
                wtf = (f * 2.2) / (
                    f + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl))
                )
                scores[d] += int(math.floor(idf * wtf * 1_000_000 + 0.5))
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(top[: tx.BM25_TOP_K], start=1):
            expected[(q, d)] = (s, rank)
    assert rows == expected


def test_source_kl_matches_local_model(spark):
    got = {
        (r.src_a, r.src_b): r.kl_pico for r in ca.source_kl(spark, SF).collect()
    }
    docs = _docs()
    counts = defaultdict(Counter)
    total = Counter()
    for _, t, s in docs:
        toks = _tokens(t)
        counts[s].update(toks)
        total.update(toks)
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[: ca.KL_TOP_TERMS]
    support = [t for t, _ in top]
    m = len(support)  # actual head size (≤ KL_TOP_TERMS)
    probs = {}
    for s, c in counts.items():
        n1 = sum(c[t] + ca.KL_ALPHA for t in support)
        probs[s] = {
            t: float(c[t] + ca.KL_ALPHA) / float(n1) for t in support
        }
    expected = {}
    for a in probs:
        for b in probs:
            if a == b:
                continue
            expected[(a, b)] = sum(
                int(
                    math.floor(
                        probs[a][t] * math.log(probs[a][t] / probs[b][t]) * 1e12
                        + 0.5
                    )
                )
                for t in support
            )
    assert got == expected
    # KL is non-negative up to quantization slack (±0.5 pico per term)
    assert all(v >= -m for v in got.values())


def test_copurchase_triangles_match_local_enumeration(spark):
    got = {
        r.part: (r.degree, r.n_triangles, r.clust_ppm)
        for r in ca.copurchase_triangles(spark, SF).collect()
    }
    edges = set(
        duckdb.sql(
            f"""
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{SF}/lineitem.parquet')
            SELECT a.l_partkey, b.l_partkey
            FROM li a JOIN li b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= {ca.BASKET_MIN_SUPPORT}
            """
        ).fetchall()
    )
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # oriented a<b<c, counted once
                for v in (a, b, c):
                    tri[v] += 1
    expected = {}
    for part, nbrs in adj.items():
        deg, t = len(nbrs), tri[part]
        clust = (2 * t * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else None
        expected[part] = (deg, t, clust)
    assert got == expected
    # sanity: a part can't be in more triangles than neighbor pairs
    for deg, t, _ in got.values():
        assert t <= deg * (deg - 1) // 2


def test_vocab_growth_invariants_and_totals(spark):
    rows = sorted(tx.vocab_growth(spark, SF).collect(), key=lambda r: r.bucket)
    docs = _docs()
    all_terms = set()
    n_tokens = 0
    for _, t, _ in docs:
        toks = _tokens(t)
        all_terms.update(toks)
        n_tokens += len(toks)
    assert sum(r.n_docs for r in rows) == len(docs)
    assert rows[-1].cum_terms == len(all_terms)
    assert rows[-1].cum_tokens == n_tokens
    assert sum(r.n_new_terms for r in rows) == len(all_terms)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_tokens >= prev.cum_tokens
        assert cur.cum_terms >= prev.cum_terms
    assert all(0 <= r.bucket < tx.VOCAB_BUCKETS for r in rows)


def test_revenue_holt_matches_local_recursion(spark):
    got = {
        r.month: (r.rev_cents, r.fitted_ppm, r.level_ppm, r.trend_ppm)
        for r in win.revenue_holt(spark, SF).collect()
    }
    monthly = duckdb.sql(
        f"""
        SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m'),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    a, b = win.HOLT_ALPHA, win.HOLT_BETA
    oma, omb = 1.0 - a, 1.0 - b
    ppm = lambda x: int(math.floor(x * 1_000_000 + 0.5))
    expected = {}
    level = trend = None
    for month, rc in monthly:
        rev = float(rc) / 100.0
        if level is None:
            level, trend, fitted = rev, 0.0, None
        else:
            fitted = level + trend
            nl = a * rev + oma * (level + trend)
            trend = b * ((a * rev + oma * (level + trend)) - level) + omb * trend
            level = nl
        expected[month] = (
            rc,
            None if fitted is None else ppm(fitted),
            ppm(level),
            ppm(trend),
        )
    assert got == expected


def test_silhouette_matches_numpy_recount(spark):
    """Simplified silhouette vs an independent numpy replay of the full
    trajectory: label-centroid init, 2 Lloyd iterations with the same
    1e-6 rounding at every stage, nearest/second-nearest by (rounded
    d2, cell), ppm-floored scores, integer-div cluster means."""
    import numpy as np

    from maillog2db_spark.operators import similarity as sim

    got = {
        r.cluster: (r.n_vectors, r.n_scored, r.mean_sil_ppm,
                    r.min_sil_ppm, r.max_sil_ppm)
        for r in sim.silhouette(spark, SF).collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    cells = sorted(set(labels.tolist()))
    cents = np.round(
        np.stack([X[labels == c].mean(axis=0) for c in cells]), 6
    )
    for _ in range(sim.N_KMEANS_ITER - 1):
        d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(axis=2), 6)
        assign = np.lexsort((np.arange(len(cells))[None, :].repeat(len(X), 0), d2), axis=1)[:, 0]
        cents = np.round(
            np.stack([X[assign == i].mean(axis=0) for i in range(len(cells))]), 6
        )
    d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(axis=2), 6)
    per_cluster = {}
    for i in range(len(X)):
        order = sorted(range(len(cells)), key=lambda j: (d2[i, j], cells[j]))
        c = cells[order[0]]
        a = round(math.sqrt(d2[i, order[0]]), 6)
        b = round(math.sqrt(d2[i, order[1]]), 6)
        s = (
            None
            if max(a, b) == 0
            else int(math.floor((b - a) / max(a, b) * 1_000_000 + 0.5))
        )
        per_cluster.setdefault(c, []).append(s)
    expected = {}
    for c, ss in per_cluster.items():
        scored = [s for s in ss if s is not None]
        expected[c] = (
            len(ss),
            len(scored),
            sum(scored) // len(scored),
            min(scored),
            max(scored),
        )
    assert got == expected


def test_hamming_topk_matches_numpy_replay(spark):
    """Binary sign-sketch ANN vs an independent numpy replay: sign
    signatures, XOR+POPCNT Hamming candidate head (ties by id), exact
    float64 cosine rerank with round-6 + id tiebreak."""
    import numpy as np

    from maillog2db_spark.operators import similarity as sim

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.hamming, r.cosine)
        for r in sim.hamming_topk(spark, SF).collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    bits = (X > 0).astype(np.int64)
    expected = {}
    for qi in range(len(ids)):
        if ids[qi] >= sim.N_QUERIES:
            continue
        cand = []
        for ci in range(len(ids)):
            if ids[ci] < sim.N_QUERIES:
                continue
            cand.append((int((bits[qi] != bits[ci]).sum()), int(ids[ci]), ci))
        cand.sort()
        rer = []
        for ham, nid, ci in cand[: sim.HAMMING_CAND]:
            cos = round(
                float(X[qi] @ X[ci])
                / (math.sqrt(float(X[qi] @ X[qi])) * math.sqrt(float(X[ci] @ X[ci]))),
                6,
            )
            rer.append((-cos, nid, ham))
        rer.sort()
        for rank, (negcos, nid, ham) in enumerate(rer[: sim.TOP_K], start=1):
            expected[(int(ids[qi]), rank)] = (nid, ham, -negcos)
    assert set(got) == set(expected)
    for k, (nid, ham, cos) in expected.items():
        gnid, gham, gcos = got[k]
        assert (gnid, gham) == (nid, ham), k
        assert abs(gcos - cos) < 2e-6, k


def test_hamming_recall_consistent_with_rankings(spark):
    """recall_ppm must equal the exact hit-count ratio between the two
    registered rankings (internal consistency, not just the oracle)."""
    from maillog2db_spark.operators import similarity as sim

    ham = {
        (r.query_id, r.neighbor_id)
        for r in sim.hamming_topk(spark, SF).collect()
    }
    exact = {}
    for r in sim.knn_bruteforce(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    rec = {r.query_id: (r.n_hit, r.recall_ppm)
           for r in sim.hamming_recall(spark, SF).collect()}
    assert set(rec) == set(exact)
    for q, nbrs in exact.items():
        n_hit = len({(q, n) for n in nbrs} & ham)
        assert rec[q] == (n_hit, n_hit * 1_000_000 // sim.TOP_K), q


def test_dsir_weights_match_local_model(spark):
    """DSIR log-importance weights vs a pure-Python replay of the full
    chain: md5 bucket hashing, add-one smoothed target/raw models,
    ppm-floored per-feature terms, k-weighted integer sums — plus the
    semantic sanity check that the target-source docs themselves score
    highest on average (they ARE the target distribution)."""
    import hashlib

    from maillog2db_spark.operators import corpus_analytics as ca
    from maillog2db_spark.operators.decontam import BENCH_SOURCE

    got = {
        r.doc_id: (r.source, r.n_bigrams, r.weight_ppm)
        for r in ca.dsir_weights(spark, SF).collect()
    }
    docs = _docs()

    def bucket(prev: str, tok: str) -> int:
        h = hashlib.md5(f"{prev} {tok}".encode()).hexdigest()[:8]
        return int(h, 16) % ca.DSIR_BUCKETS

    per_doc: dict[int, Counter] = {}
    src = {}
    ct: Counter = Counter()
    cr: Counter = Counter()
    for d, t, s in docs:
        toks = _tokens(t)
        src[d] = s
        c = Counter(bucket(a, b) for a, b in zip(toks, toks[1:]))
        per_doc[d] = c
        (ct if s == BENCH_SOURCE else cr).update(c)
    nt, nr = sum(ct.values()), sum(cr.values())
    B = ca.DSIR_BUCKETS
    expected = {}
    for d, _, s in docs:
        w = 0
        for b, k in per_doc[d].items():
            term = math.floor(
                (math.log((ct[b] + 1) / (nt + B)) - math.log((cr[b] + 1) / (nr + B)))
                * 1_000_000
                + 0.5
            )
            w += k * term
        expected[d] = (s, sum(per_doc[d].values()), w)
    assert got == expected
    bench = [w for d, (s, _, w) in got.items() if s == BENCH_SOURCE]
    rest = [w for d, (s, _, w) in got.items() if s != BENCH_SOURCE]
    assert sum(bench) / len(bench) > sum(rest) / len(rest)


def test_cluster_labels_matches_python_recount(spark):
    """embed_cluster_labels vs an independent recount: numpy replay of
    the k-means trajectory for the final assignment, pure-Python token
    counting (the translate+split contract), integer ppb-share lift,
    (lift desc, n_ct desc, term) ranking."""
    import numpy as np

    from maillog2db_spark.operators import corpus_analytics as ca
    from maillog2db_spark.operators import similarity as sim

    got = {
        (r.cluster, r.rank): (r.term, r.n_ct, r.lift_ppm)
        for r in ca.cluster_labels(spark, SF).collect()
    }

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    cells = sorted(set(labels.tolist()))
    cents = np.round(np.stack([X[labels == c].mean(axis=0) for c in cells]), 6)
    for _ in range(sim.N_KMEANS_ITER - 1):
        d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(axis=2), 6)
        assign = np.lexsort(
            (np.arange(len(cells))[None, :].repeat(len(X), 0), d2), axis=1
        )[:, 0]
        cents = np.round(
            np.stack([X[assign == i].mean(axis=0) for i in range(len(cells))]), 6
        )
    d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(axis=2), 6)
    cluster_of = {}
    for i, r in enumerate(rows):
        order = sorted(range(len(cells)), key=lambda j: (d2[i, j], cells[j]))
        cluster_of[r[0]] = cells[order[0]]

    lo = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    )
    ct = Counter()
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        if doc_id not in cluster_of:
            continue
        for tok in re.split(r"\s+", (text or "").strip().translate(lo)):
            if tok:
                ct[(cluster_of[doc_id], tok)] += 1
    total = sum(ct.values())
    t_c, n_t = Counter(), Counter()
    for (c, t), n in ct.items():
        t_c[c] += n
        n_t[t] += n
    expected = {}
    for c in t_c:
        scored = []
        for (cc, t), n in ct.items():
            if cc != c or n < ca.CLUSTER_LABEL_MIN_CT:
                continue
            lift = (n * 1_000_000_000 // t_c[c]) * 1_000_000 // (
                n_t[t] * 1_000_000_000 // max(total, 1)
            )
            scored.append((-lift, -n, t))
        for rank, (nl, nn, t) in enumerate(sorted(scored)[: ca.CLUSTER_LABEL_TOP], 1):
            expected[(c, rank)] = (t, -nn, -nl)
    assert got == expected


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_components_matches_union_find_on_adversarial_graphs(spark):
    """Star contraction vs a Python union-find on the topologies that
    break naive approaches: a 512-node chain (diameter stress — label
    propagation would need 511 rounds), a star, two cliques joined by
    a bridge, self-loops, duplicate and reversed edges, singleton
    pairs — and the V-shapes that broke the original convergence test
    (a node with out-edges to two distinct pure-sink roots passes the
    'no dst is also a src' check alone, so [(1,3),(2,3)] used to exit
    at round 0 with node 2 wrongly isolated). Also pins the round
    bound: the chain must converge in O(log n) rounds, not O(n)."""
    from maillog2db_spark.operators.graph import star_components

    chain = [(i, i + 1) for i in range(1000, 1512)]
    star = [(2000, 2000 + i) for i in range(1, 40)]
    cliq1 = [(3000 + i, 3000 + j) for i in range(8) for j in range(i + 1, 8)]
    cliq2 = [(3100 + i, 3100 + j) for i in range(8) for j in range(i + 1, 8)]
    bridge = [(3007, 3100)]
    noise = [(4000, 4000), (4001, 4002), (4002, 4001), (4003, 4004),
             (4004, 4003), (4003, 4004)]
    # V-shapes: after big→small orientation these are 3→1, 3→2 (and
    # 5→1, 5→2, 6→3) — depth 1 everywhere, but src 3 (resp. 5) has
    # out-degree 2, so they are NOT star forests and need one more
    # contraction round
    vshape = [(1, 3), (2, 3)]
    vshape2 = [(50, 10), (50, 20), (60, 30)]
    edges = chain + star + cliq1 + cliq2 + bridge + noise + vshape + vshape2
    want = _union_find([(a, b) for a, b in edges if a != b])

    stats = {}
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.comp
           for r in star_components(df, stats=stats).collect()}
    assert got == want
    # 512-node chain: log2(512) = 9; allow slack for the constant, but
    # anything near O(n) (hundreds of rounds) must fail loudly
    assert stats["rounds"] <= 15, stats


def test_part_components_matches_union_find(spark):
    """The registered co-purchase component query vs an independent
    union-find over the same thresholded pair base."""
    from maillog2db_spark.operators import corpus_analytics as ca
    from maillog2db_spark.operators.graph import part_components

    pairs = [
        (r.pa, r.pb)
        for r in ca._li_pair_counts(spark, SF)
        .filter(f"w >= {ca.BASKET_MIN_SUPPORT}")
        .collect()
    ]
    labels = _union_find(pairs)
    sizes, ecnt = defaultdict(int), defaultdict(int)
    for n, c in labels.items():
        sizes[c] += 1
    for a, b in pairs:
        ecnt[labels[a]] += 1
    want = {c: (sizes[c], ecnt[c]) for c in sizes}
    got = {r.component_id: (r.n_parts, r.n_edges)
           for r in part_components(spark, SF).collect()}
    assert got == want


_LO = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                    "abcdefghijklmnopqrstuvwxyz")


def _py_tokens(text):
    return [t for t in re.split(r"\s+", (text or "").strip().translate(_LO))
            if t]


def _py_unigram_segment(w, lp):
    """Viterbi with the (score, piece-length) tie-break; asserts the
    pieces concatenate back to the word."""
    dp = [(0, 0)] + [None] * len(w)
    for j in range(1, len(w) + 1):
        best = None
        for l in range(1, min(tx.UNI_MAX_PIECE, j) + 1):
            piece = w[j - l:j]
            if piece in lp and dp[j - l] is not None:
                c = (dp[j - l][0] + lp[piece], l)
                if best is None or c > best:
                    best = c
        dp[j] = best
    pieces, p = [], len(w)
    while p > 0:
        l = dp[p][1]
        pieces.append(w[p - l:p])
        p -= l
    assert "".join(reversed(pieces)) == w  # conservation
    return pieces


def _py_unigram_train(words):
    """From-scratch hard-EM trainer: returns (final E-step counts,
    final lp) — the Python twin of text._uni_state."""
    def logp(counts):
        t, v = sum(counts.values()), len(counts)
        return {p: math.floor(math.log((c + 1) / float(t + v)) * 1e6 + 0.5)
                for p, c in counts.items()}

    def viterbi_counts(lp):
        out = Counter()
        for w, f in words.items():
            for piece in _py_unigram_segment(w, lp):
                out[piece] += f
        return out

    seed = Counter()
    singles = set()
    for w, f in words.items():
        for i in range(len(w)):
            singles.add(w[i])
            for l in range(1, min(tx.UNI_MAX_PIECE, len(w) - i) + 1):
                seed[w[i:i + l]] += f
    seed = Counter({p: c for p, c in seed.items()
                    if len(p) == 1 or c >= tx.UNI_MIN_SEED})
    lp = logp(seed)
    for _ in range(tx.UNI_EM_ITERS):
        counts = viterbi_counts(lp)
        retained = Counter({p: counts.get(p, 0) for p in singles})
        retained.update({p: c for p, c in counts.items() if p not in singles})
        lp = logp(retained)
    return counts, lp


def _py_train_words():
    words = Counter()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for t in _py_tokens(text):
            if len(t) <= tx.UNI_MAX_WORD:
                words[t] += 1
    return words


def test_unigram_tokenizer_matches_python_trainer(spark):
    """doc_unigram_tokenizer vs a from-scratch Python reimplementation
    of the whole hard-EM trainer: substring seed with the multi-char
    floor, add-one ppm log-probs (identical quantization), Viterbi
    with the (score, piece-length) tie-break, retention of singles,
    two EM rounds, final ranking — plus the pieces-concatenate-to-word
    conservation invariant inside every segmentation."""
    got = [
        (r.rank, r.piece, r.piece_len, r.cnt, r.share_ppm)
        for r in tx.unigram_tokenizer(spark, SF).collect()
    ]
    counts, _lp = _py_unigram_train(_py_train_words())
    total = max(sum(counts.values()), 1)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (i + 1, p, len(p), c, c * 1_000_000 // total)
        for i, (p, c) in enumerate(ranked[: tx.UNI_TOP])
    ]
    assert got == expected


def test_unigram_encode_stats_matches_python(spark):
    """doc_unigram_encode_stats vs the Python twin: segment every doc's
    tokens under the FINAL trained log-probs (over-cap words fall back
    to characters), per-doc token/piece counts and integer-ppm
    compression."""
    _counts, lp = _py_unigram_train(_py_train_words())
    expected = {}
    seg_cache = {}
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        toks = _py_tokens(text)
        if not toks:
            continue
        n_pieces = 0
        for t in toks:
            if len(t) > tx.UNI_MAX_WORD:
                n_pieces += len(t)
            else:
                if t not in seg_cache:
                    seg_cache[t] = len(_py_unigram_segment(t, lp))
                n_pieces += seg_cache[t]
        expected[doc_id] = (
            len(toks), n_pieces, len(toks) * 1_000_000 // n_pieces
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_pieces, r.compression_ppm)
        for r in tx.unigram_encode_stats(spark, SF).collect()
    }
    assert got == expected


def test_retrieval_label_eval_grid_and_metric_invariants(spark):
    """The eval grid is complete (every query x system row exists,
    zero-filled), and the metric arithmetic is internally consistent:
    rr_ppm = 1e6 // first_rel_rank (0 iff no relevant retrieved),
    prec > 0 iff rr > 0, prec <= 1e6. Component correctness is owned
    by the BM25/cosine differentials; this pins the harness."""
    from maillog2db_spark.operators import retrieval as rtv

    rows = rtv.retrieval_label_eval(spark, SF).collect()
    assert len(rows) == rtv.HYBRID_N_QUERIES * 3
    assert {(r.system, r.query_id) for r in rows} == {
        (s, q) for s in ("lex", "dense", "hybrid")
        for q in range(rtv.HYBRID_N_QUERIES)
    }
    for r in rows:
        if r.first_rel_rank == 0:
            assert r.rr_ppm == 0 and r.prec_at_k_ppm == 0, r
        else:
            assert r.rr_ppm == 1_000_000 // r.first_rel_rank, r
            assert 0 < r.prec_at_k_ppm <= 1_000_000, r
    # (no non-vacuousness assertion: at this 50-vector-per-label SF an
    # all-miss grid is a legitimate outcome — verified empirically, and
    # the sf0.01 oracle hash covers the nonzero regime: lex MRR 0.30,
    # dense 0.15, hybrid 0.23 there)


def test_curriculum_order_invariants(spark):
    """Curriculum export: positions are the exact permutation 0..n-1,
    deciles are weakly DESCENDING along the position order (the whole
    point), each decile block is contiguous with the standard ntile
    fill sizes, and shard/slot are pos's div/mod."""
    from maillog2db_spark.operators import sampling as smp

    rows = sorted(smp.curriculum_order(spark, SF).collect(),
                  key=lambda r: r.pos)
    n = len(rows)
    assert [r.pos for r in rows] == list(range(n))
    assert len({r.doc_id for r in rows}) == n
    decs = [r.decile for r in rows]
    assert all(a >= b for a, b in zip(decs, decs[1:]))  # descending tiers
    sizes = Counter(decs)
    q, rem = n // 10, n % 10
    assert sorted(sizes.values(), reverse=True) == sorted(
        [q + 1] * rem + [q] * (10 - rem), reverse=True
    )
    for r in rows:
        assert r.shard == r.pos // smp.SHUFFLE_SHARD_SIZE
        assert r.slot == r.pos % smp.SHUFFLE_SHARD_SIZE


def test_seasonal_index_matches_local_recount(spark):
    """ord_seasonal_index vs a from-scratch Python recount: dense
    month index, complete-window 2x12 centered MA with the exact
    integer numerator, ratio/mean integer quantization."""
    got = {
        r.month_num: (r.n_obs, r.mean_ratio_ppm)
        for r in win.seasonal_index(spark, SF).collect()
    }
    monthly = {}
    for (midx, cents) in duckdb.sql(
        f"""
        SELECT year(CAST(o_orderdate AS DATE)) * 12
               + month(CAST(o_orderdate AS DATE)) AS midx,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1
        """
    ).fetchall():
        monthly[midx] = cents
    per_month = defaultdict(list)
    for midx, cents in monthly.items():
        w13 = [monthly[i] for i in range(midx - 6, midx + 7) if i in monthly]
        w11 = [monthly[i] for i in range(midx - 5, midx + 6) if i in monthly]
        if len(w13) != 13:
            continue
        num24 = sum(w13) + sum(w11)
        if num24 <= 0:
            continue
        per_month[(midx - 1) % 12 + 1].append(cents * 24 * 1_000_000 // num24)
    expected = {}
    for m in range(1, 13):
        if m in {k for k in got}:
            rs = per_month.get(m, [])
            expected[m] = (len(rs), sum(rs) // len(rs) if rs else None)
    assert got == expected


def _python_peel(sf_dir):
    """Reference k-core: peel to convergence in Python, return
    (rounds, final degree dict)."""
    from maillog2db_spark.operators import graph as gr

    edges = set(
        duckdb.sql(
            f"""
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{sf_dir}/lineitem.parquet')
            SELECT a.l_partkey, b.l_partkey
            FROM li a JOIN li b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= {ca.BASKET_MIN_SUPPORT}
            """
        ).fetchall()
    )
    rounds = 0
    while True:
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        alive = {n for n, d in deg.items() if d >= gr.KCORE_K}
        nxt = {(a, b) for a, b in edges if a in alive and b in alive}
        if nxt == edges:
            break
        edges = nxt
        rounds += 1
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    return rounds, dict(deg)


def test_part_kcore_matches_python_peel_and_converges_in_budget(spark):
    """li_part_kcore vs a Python peel run TO CONVERGENCE — and every
    gate corpus must converge within the KCORE_ROUNDS oracle unroll
    depth (the unrolled DuckDB twin is only the true k-core where
    peeling has settled by that round; sf0.01 needs 10 rounds, which
    the original depth of 8 silently missed). Also the core property
    itself: every surviving node keeps >= K neighbors."""
    from maillog2db_spark.operators import graph as gr

    got = {r.part: r.core_degree
           for r in gr.part_kcore(spark, SF).collect()}
    rounds, want = _python_peel(SF)
    assert rounds <= gr.KCORE_ROUNDS, rounds
    assert got == want
    assert all(d >= gr.KCORE_K for d in got.values())
    # the oracle-depth pin at the DRIVER's gate scale (python-only,
    # no second Spark run): convergence must land within the unroll
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        rounds, _ = _python_peel(sf_dir)
        assert rounds <= gr.KCORE_ROUNDS, (sf_dir, rounds)


def test_kcore_long_peel_chain_converges_past_oracle_depth(spark):
    """The runtime convergence guard: a path glued to a 4-clique peels
    ONE node per round under k=2 (only the dangling end is below
    degree 2 each round), needing rounds ≈ path length — past the
    8-round oracle unroll depth. The engine must keep peeling to the
    true fixpoint (exactly the clique, degree 3 everywhere) instead of
    stopping at a fixed round count and returning path nodes (which
    have < 2 surviving neighbors) labeled as core members — the
    failure mode the guard exists to prevent."""
    from maillog2db_spark.operators import graph as gr

    path = [(i, i + 1) for i in range(100, 120)]
    clique = [(200 + i, 200 + j) for i in range(4) for j in range(i + 1, 4)]
    glue = [(120, 200)]
    df = spark.createDataFrame(path + clique + glue, "u bigint, v bigint")
    stats = {}
    got = {r.node: r.core_degree for r in gr.kcore(df, k=2, stats=stats).collect()}
    assert got == {200 + i: 3 for i in range(4)}
    assert stats["rounds"] > gr.KCORE_ROUNDS, stats  # the old fixed
    # budget would have stopped mid-peel with path nodes still present


def test_kcore_raises_past_round_budget(spark):
    """Budget exhaustion fails loudly: the same slow-peeling path with
    a tiny max_rounds raises instead of silently returning non-core
    nodes."""
    from maillog2db_spark.operators import graph as gr

    path = [(i, i + 1) for i in range(100, 110)]
    df = spark.createDataFrame(path, "u bigint, v bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        gr.kcore(df, k=2, max_rounds=3)
