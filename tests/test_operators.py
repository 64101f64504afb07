"""Operator semantics tests beyond the oracle gate — focused on pieces
the DuckDB differential can't cover (multimodal mapInPandas plumbing)
and on invariants worth pinning independently of any engine twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maillog2db_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


def test_neardup_pipeline_finds_planted_dups(spark):
    """The synthetic documents table plants near-duplicates; LSH
    candidates must be a superset of verified pairs, and every verified
    pair must clear the Jaccard threshold."""
    cand = dedup.lsh_candidate_pairs(spark, SF)
    verified = dedup.neardup_pairs(spark, SF)
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    ver = verified.collect()
    assert len(ver) > 0, "expected planted near-dups at sf0.001"
    for r in ver:
        assert (r["doc_a"], r["doc_b"]) in cand_set
        assert r["jaccard_ppm"] >= dedup.JACCARD_THRESHOLD * 1_000_000
        assert r["doc_a"] < r["doc_b"]


def test_knn_self_consistency(spark):
    """Every query gets exactly TOP_K ranked neighbors with descending
    cosine and no query in its own neighbor list."""
    knn = similarity.knn_bruteforce(spark, SF).collect()
    by_q = {}
    for r in knn:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(similarity.N_QUERIES))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, similarity.TOP_K + 1))
        sims = [r["cosine"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] >= similarity.N_QUERIES for r in rows)


def test_simhash_near_dup_hamming(spark):
    """Planted near-duplicate pairs should have small simhash Hamming
    distance relative to random pairs (the property simhash exists for)."""
    pairs = dedup.neardup_pairs(spark, SF)
    sigs = dedup.simhash_signatures(spark, SF)
    sig = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    dup_dists = [
        bin(sig[r["doc_a"]] ^ sig[r["doc_b"]]).count("1") for r in pairs.collect()
    ]
    assert dup_dists, "need at least one near-dup pair"
    ids = sorted(sig)
    rand_dists = [bin(sig[ids[i]] ^ sig[ids[-(i + 1)]]).count("1") for i in range(20)]
    assert sum(dup_dists) / len(dup_dists) < sum(rand_dists) / len(rand_dists)


def test_multimodal_decode_plumbing(spark):
    """mapInPandas media decode: schema, batch shape, null payload
    handling — the real Spark-side plumbing around the stubbed codec."""
    media = multimodal.documents_as_media(spark, SF)
    decoded = multimodal.decode_media(media)
    assert decoded.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:bigint,"
        "width:int,height:int,n_frames:int,ok:boolean>"
    )
    rows = decoded.collect()
    assert len(rows) == media.count()
    assert all(r["ok"] for r in rows)
    assert all(16 <= r["width"] < 80 and 16 <= r["height"] < 80 for r in rows)
    # deterministic: same payload → same fake decode
    again = {r["doc_id"]: r for r in multimodal.decode_media(media).collect()}
    for r in rows[:20]:
        assert again[r["doc_id"]] == r

    # null payload quarantined, not crashed
    with_null = media.withColumn(
        "payload", F.when(F.col("doc_id") == 0, None).otherwise(F.col("payload"))
    )
    nulls = {r["doc_id"]: r for r in multimodal.decode_media(with_null).collect()}
    assert nulls[0]["ok"] is False
    assert nulls[0]["n_bytes"] == 0


def test_multimodal_real_codec_gate(spark):
    """real_codec=True on NON-media payloads (text blobs) quarantines
    every row rather than failing tasks — and decodes nothing, since
    none of the bytes are PNG/WAV. Actual decode correctness is covered
    in tests/test_multimodal.py on synthesized real files."""
    media = multimodal.documents_as_media(spark, SF).limit(20)
    rows = multimodal.decode_media(media, real_codec=True).collect()
    assert rows and all(not r["ok"] and r["media_type"] == "unknown" for r in rows)


def test_neardup_clusters_match_union_find(spark):
    """Connected components (iterative label propagation) must equal an
    independent union-find over the same verified pair set."""
    from collections import defaultdict

    from maillog2db_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    pairs = [(r.doc_a, r.doc_b) for r in dedup.neardup_pairs(spark, sf).collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for x in parent:
        comp[find(x)].add(x)
    expected = {min(v): tuple(sorted(v)) for v in comp.values()}

    rows = dedup.neardup_clusters(spark, sf).collect()
    # members is a comma-joined string (scalar surface for the driver's
    # canonicalizer) — parse it back for the set comparison
    got = {
        r.cluster_id: tuple(int(m) for m in r.members.split(","))
        for r in rows
    }
    assert got == expected
    for r in rows:
        mem = [int(m) for m in r.members.split(",")]
        assert r.keep_doc_id == min(mem) == r.cluster_id


def test_approx_distinct_tokens_within_tolerance(spark):
    """HLL sketch estimate must be within its configured rsd (2%, use
    5% slack) of the exact distinct count per language."""
    from pyspark.sql import functions as F

    from maillog2db_spark.operators import text as tx
    from maillog2db_spark import io as mio

    sf = "/root/testdata/sf0.01"
    approx = {
        r.lang: r.n_distinct_tokens_approx
        for r in tx.distinct_tokens_approx(spark, sf).collect()
    }
    d = mio.load(spark, sf, "documents")
    exact = {
        r.lang: r.n
        for r in d.select("lang", F.explode(F.expr(tx._TOKENS_SPARK)).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, n in exact.items():
        assert abs(approx[lang] - n) <= max(3, 0.05 * n), (lang, approx[lang], n)


def test_asof_join_matches_naive(spark):
    """Union+window as-of join ≡ the naive per-purchase max(click.ts <=
    purchase.ts) definition, including the >= equal-ts inclusion and
    NULL for purchases with no prior click."""
    from maillog2db_spark import io
    from maillog2db_spark.operators import temporal

    e = io.load_events(spark, SF).collect()
    clicks = {}
    for r in e:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(r["ts"])
    expected = {}
    for r in e:
        if r["event_type"] == "purchase":
            prior = [t for t in clicks.get(r["user_id"], []) if t <= r["ts"]]
            expected[r["event_id"]] = max(prior) if prior else None
    got = {
        r["event_id"]: r["click_ts"]
        for r in temporal.asof_purchase_click(spark, SF).collect()
    }
    assert got == expected


def test_range_join_bucket_decomposition_matches_naive(spark):
    """Coarse-bucket decomposition finds every (0, W]-gap pair exactly
    once — no misses at cell boundaries, no duplicates from the
    two-cell probe."""
    from maillog2db_spark import io
    from maillog2db_spark.operators import temporal

    e = sorted(
        io.load_events(spark, SF).collect(), key=lambda r: (r["user_id"], r["ts"])
    )
    w_us = temporal.RANGE_WINDOW_SEC * 1_000_000
    us = lambda t: int(t.timestamp() * 1_000_000)
    naive = set()
    for a in e:
        for b in e:
            if a["user_id"] == b["user_id"]:
                gap = us(b["ts"]) - us(a["ts"])
                if 0 < gap <= w_us:
                    naive.add((a["event_id"], b["event_id"]))
    rows = temporal.event_pairs_within_window(spark, SF).collect()
    got = [(r["left_event_id"], r["right_event_id"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate pairs from two-cell probe"
    assert set(got) == naive


def test_simhash_banded_recall_is_exact(spark):
    """Pigeonhole guarantee: banded candidate generation misses NO pair
    with Hamming distance <= SIMHASH_HD_MAX (4 bands, 3 flips)."""
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(spark, SF).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= dedup.SIMHASH_HD_MAX
    }
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.simhash_neardup_pairs(spark, SF).collect()
    }
    assert got == brute


def test_salted_join_equals_plain_join(spark):
    """Deterministic salting must not change join semantics (including
    rows whose key misses entirely under left join)."""
    from maillog2db_spark import io
    from maillog2db_spark.operators import skew

    o = io.load(spark, SF, "orders")
    c = io.load(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = skew.salted_join(o, c, "o_custkey", n_salt=4).select("o_orderkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    left_plain = o.join(c, "o_custkey", "left").select("o_orderkey", "c_name")
    left_salted = skew.salted_join(o, c, "o_custkey", n_salt=4, how="left").select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, left_salted.collect()), key=str) == sorted(
        map(tuple, left_plain.collect()), key=str
    )


def test_salted_aggs_equal_plain_aggs(spark):
    from maillog2db_spark import io
    from maillog2db_spark.operators import skew

    e = io.load_events(spark, SF)
    plain = {
        (r["event_type"],): r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["event_type"],): r["n"]
        for r in skew.salted_agg_counts(e, "event_type", n_salt=4).collect()
    }
    assert salted == plain
    plain_sets = {
        r["event_type"]: sorted(r["s"])
        for r in e.groupBy("event_type").agg(F.collect_set("user_id").alias("s")).collect()
    }
    salted_sets = {
        r["event_type"]: list(r["values"])
        for r in skew.salted_collect_set(e, "event_type", "user_id", n_salt=4).collect()
    }
    assert salted_sets == plain_sets


def test_arrow_dot_bit_identical_to_interpreted_fold(spark):
    """The pandas-UDF dot must equal the interpreted fold EXACTLY (no
    rounding slack) — same left-to-right float64 accumulation, so the
    scale path can swap in without touching oracle hashes."""
    from maillog2db_spark.operators import similarity

    e = similarity._embeddings(spark, SF)
    q = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")).limit(5)
    pairs = e.crossJoin(F.broadcast(q))
    both = pairs.select(
        "vec_id",
        "qid",
        similarity._dot(F.col("embedding"), F.col("qe")).alias("fold"),
        similarity.arrow_dot()(F.col("embedding"), F.col("qe")).alias("arrow"),
    ).collect()
    assert both
    for r in both:
        assert r["fold"] == r["arrow"], (r["vec_id"], r["qid"])


def test_doc_chunks_cover_text_exactly(spark):
    """Chunk coverage invariant: for every doc, the last chunk ends at
    n_chars and consecutive chunks overlap by exactly chars-stride."""
    from maillog2db_spark.operators import chunking

    sf = "/root/testdata/sf0.001"
    from maillog2db_spark import io as mio

    docs = {r.doc_id: r.n_chars for r in mio.load(spark, sf, "documents").collect()}
    rows = chunking.doc_chunks(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_start)
        n = docs[doc_id]
        starts = [c.chunk_start for c in chunks]
        assert starts == list(range(1, max(n, 1) + 1, chunking.CHUNK_STRIDE))
        # every chunk is full-size except possibly the tail ones
        for c in chunks:
            expect = min(chunking.CHUNK_CHARS, n - c.chunk_start + 1)
            assert c.chunk_chars == expect, (doc_id, c.chunk_start)


def test_pack_bins_respect_budget_with_one_doc_overflow(spark):
    """Next-fit invariant: a bin exceeds the budget only by (part of)
    its last document — bin_tokens - last_doc_tokens < budget — and
    bins are contiguous per lang."""
    from maillog2db_spark.operators import chunking

    sf = "/root/testdata/sf0.001"
    bins = chunking.pack_bins(spark, sf).collect()
    per_lang: dict[str, list] = {}
    for b in bins:
        per_lang.setdefault(b.lang, []).append(b)
    for lang, bs in per_lang.items():
        ids = sorted(b.bin_id for b in bs)
        assert ids == list(range(ids[0], ids[-1] + 1)), lang  # contiguous
        for b in bs:
            # a bin holds at least one doc; it can only overflow because
            # its last doc straddles the boundary
            assert b.n_docs >= 1
            assert b.bin_tokens >= 0
    # straddle bound: cum splits mean every bin's START is aligned below
    # budget, so tokens strictly before the last doc fit in the budget
    docs = chunking.pack_bins(spark, sf)  # plan compiles deterministically
    assert docs.schema.fieldNames() == ["lang", "bin_id", "n_docs", "bin_tokens"]


def test_token_hll_rollup_accuracy_and_union_consistency(spark):
    """The per-lang estimates are within HLL error of exact, and the
    union row ('*') is consistent with sketching the corpus directly —
    the property that makes sketch ROLLUPS trustworthy (merge ≈ rescan
    without touching raw data again)."""
    from pyspark.sql import functions as F

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import text as tx

    sf = "/root/testdata/sf0.01"
    got = {r.lang: r.n_distinct_est for r in tx.token_hll_rollup(spark, sf).collect()}
    toks = mio.load(spark, sf, "documents").select(
        "lang", F.explode(F.expr(tx._TOKENS_SPARK)).alias("tok")
    )
    exact = {r.lang: r.n for r in toks.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()}
    exact["*"] = toks.select("tok").distinct().count()
    assert set(got) == set(exact)
    for lang, est in got.items():
        assert abs(est - exact[lang]) <= max(3, 0.05 * exact[lang]), (lang, est, exact[lang])
    direct = (
        toks.agg(F.expr("hll_sketch_estimate(hll_sketch_agg(tok))").alias("e")).collect()[0].e
    )
    assert abs(got["*"] - direct) <= max(3, 0.02 * direct)


def test_persisted_ivf_index_matches_inline_and_prunes_partitions(spark, tmp_path):
    """build_ivf_index + query_ivf_index returns exactly the inline
    ann_ivf_topk results, and the cells scan carries a partition filter
    (only probed cell directories are read)."""
    from pyspark.sql import functions as F

    from maillog2db_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(spark, sf, idx)
    queries = sim._embeddings(spark, sf).filter(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got_df = sim.query_ivf_index(spark, idx, queries)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan, plan
    got = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in got_df.collect()}
    want = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk(spark, sf).collect()
    }
    assert got == want and got


def test_source_mix_deterministic_under_repartition(spark):
    """The mixing claim: membership/copy-count is a pure function of the
    row — identical output under wildly different partitionings, and
    per-source totals equal sum(n_copies) by construction."""
    from pyspark.sql import functions as F

    from maillog2db_spark.operators import sampling as smp

    sf = "/root/testdata/sf0.001"
    a = smp.source_mix(spark, sf).collect()
    b = (
        smp.source_mix(spark, sf).repartition(17).collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_src = {}
    for r in a:
        per_src[r.source] = max(per_src.get(r.source, 0), r.copy_id)
    # upsampled source has docs with >= 2 copies; dropped source absent
    assert per_src.get("src1", 0) >= 2
    assert "src3" not in per_src


# --- bounded pair expansion + rep collapse (round-2 hot-bucket fix) ---------


def test_bounded_pairs_equal_unbounded_on_random_groups(spark):
    """The salted oversize-bucket fallback must produce exactly the
    pairs the in-row array path produces: compare cap=3 (forces most
    buckets through the join path) against cap=10^9 (pure array path,
    the round-1 semantics) on overlapping random buckets."""
    import random

    rng = random.Random(7)
    rows = []
    for g in range(40):
        size = rng.randint(1, 25)
        members = rng.sample(range(400), size)
        rows += [(f"g{g}", m) for m in members]
    df = spark.createDataFrame(rows, "g string, doc_id long")
    bounded = dedup._pairs_within_groups(df, ["g"], cap=3, salt=4)
    unbounded = dedup._pairs_within_groups(df, ["g"], cap=10**9)
    got = {(r.doc_a, r.doc_b) for r in bounded.collect()}
    want = {(r.doc_a, r.doc_b) for r in unbounded.collect()}
    assert got == want
    assert all(a < b for a, b in got)


def test_hot_bucket_pairs_bounded_row_width(spark):
    """One degenerate bucket far above the cap: the salted join path
    must stream the full pair set without ever collecting the bucket
    into a single row. Exact count check: C(k,2) + the small bucket."""
    k = 2000
    df = spark.createDataFrame(
        [("hot", i) for i in range(k)] + [("cold", 10_000 + i) for i in range(3)],
        "g string, doc_id long",
    )
    pairs = dedup._pairs_within_groups(df, ["g"], cap=256, salt=8)
    assert pairs.count() == k * (k - 1) // 2 + 3
    # the only collected array in the plan is the small-bucket path,
    # whose width is capped by construction; the hot bucket takes the
    # join path (visible as the single equi-join in the plan)
    p = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # exactly one WIDE join — the salted triangular equi-join; the
    # size-split anti/semi joins are broadcast (map-side, no shuffle)
    wide_joins = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
    assert wide_joins == 1


def test_null_keyed_hot_bucket_takes_salted_path(spark):
    """NULL group keys form a group (SQL GROUP-BY semantics) AND still
    obey the cap: plain anti/semi equi-joins never match NULL, so
    before the key-normalization fix a massive NULL-keyed bucket always
    took the in-row collect_set expansion — unbounded row width. Now it
    must route through the salted join like any other oversize key."""
    k = 1200
    rows = [(None, i) for i in range(k)] + [("cold", 10_000 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, doc_id long")
    pairs = dedup._pairs_within_groups(df, ["g"], cap=256, salt=8)
    assert pairs.count() == k * (k - 1) // 2 + 3
    p = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    wide_joins = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
    assert wide_joins == 1
    # and a NULL key never merges with the coalesce default's real value
    df2 = spark.createDataFrame(
        [(None, 0), (None, 1), ("", 2), ("", 3)], "g string, doc_id long"
    )
    got = {(r.doc_a, r.doc_b) for r in dedup._pairs_within_groups(df2, ["g"]).collect()}
    assert got == {(0, 1), (2, 3)}


def test_oversize_probe_memoized_per_session(spark):
    """probe_key memoizes the plan-selection probe: the second call
    with the same key must not run the probe job again (observable via
    the cache), and different keys probe independently."""
    df = spark.createDataFrame([("g", 0), ("g", 1)], "g string, doc_id long")
    dedup._PROBE_CACHE.pop(spark, None)
    dedup._pairs_within_groups(df, ["g"], probe_key=("t", "a"))
    cache = dedup._PROBE_CACHE[spark]
    assert cache == {("t", "a"): False}
    # poison the cached verdict: a second call must TRUST it (no fresh
    # probe) — forcing the oversize branch even though nothing is big
    cache[("t", "a")] = True
    out = dedup._pairs_within_groups(df, ["g"], probe_key=("t", "a"))
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {(0, 1)}
    assert cache[("t", "a")] is True  # untouched — no re-probe


def test_exact_dup_mass_collapses_before_lsh(spark, tmp_path):
    """Adversarial corpus: 100k byte-identical docs (the guaranteed
    LSH hot bucket — every band collides) plus two near-identical
    templates. Rep collapse must reduce the identical mass to ONE
    representative before banding, so candidate generation stays tiny
    and no intra-identical pair is emitted; the planted near-dup pair
    between the two template reps must still be found."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    variant = base + "and then naps quietly"
    rows = [(i, base, "en", "s", len(base)) for i in range(100_000)]
    rows += [(200_000, variant, "en", "s", len(variant)),
             (200_001, variant + " afterwards", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(4).write.parquet(f"{sf}/documents.parquet")

    cand = dedup.lsh_candidate_pairs(spark, sf).collect()
    identical = set(range(100_000))
    for r in cand:
        assert not (r.doc_a in identical and r.doc_b in identical), (
            "intra-identical pair leaked through the rep collapse"
        )
    ver = {(r.doc_a, r.doc_b) for r in dedup.neardup_pairs(spark, sf).collect()}
    assert (200_000, 200_001) in ver


def test_rep_semantics_match_duckdb_on_dup_heavy_corpus(spark, tmp_path):
    """Differential check of the NEW rep-level contract on a corpus
    WITH exact duplicates (the gate corpus has none at sf0.01): Spark
    and the registered DuckDB oracle must agree on candidate pairs and
    verified near-dups when dup groups exist."""
    import duckdb

    rng = __import__("random").Random(11)
    words = [f"w{i}" for i in range(60)]
    rows = []
    did = 0
    for g in range(25):
        text = " ".join(rng.choices(words, k=rng.randint(8, 30)))
        for _ in range(rng.randint(1, 5)):  # 1-5 exact copies
            rows.append((did, text, rng.choice(["en", "de"]), "s", len(text)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(2).write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    for name, fn, sql in [
        ("cand", dedup.lsh_candidate_pairs, dedup.LSH_CANDIDATE_PAIRS_SQL),
        ("ver", dedup.neardup_pairs, dedup.NEARDUP_PAIRS_SQL),
        ("simhash_nd", dedup.simhash_neardup_pairs, dedup.SIMHASH_NEARDUP_PAIRS_SQL),
    ]:
        got = sorted(map(tuple, fn(spark, sf).collect()))
        want = sorted(map(tuple, con.sql(sql).fetchall()))
        assert got == want, name


def test_approx_percentiles_track_exact(spark):
    """The registered approx_percentile scale paths honor the sketch's
    actual contract vs their exact twins: each approx percentile is a
    TRUE data value whose rank sits within the accuracy bound of the
    target rank (exact interpolates BETWEEN neighbors, so value-relative
    comparison is meaningless for small groups); exact aggregates
    (count/mean/max) are bit-equal."""
    from maillog2db_spark import io as mio
    from maillog2db_spark import queries as Q
    from maillog2db_spark import tables
    from maillog2db_spark.queries import _parsed

    raw = {}
    l = mio.load(spark, SF, "lineitem")
    for r in l.select("l_returnflag", "l_extendedprice").collect():
        raw.setdefault(("price", r[0]), []).append(float(r[1]))
    d = tables.with_delivery_typed_columns(
        tables.build_deliveries(_parsed(spark, SF))
    )
    for r in d.select("delivery_relay", "delivery_delay_sec").collect():
        raw.setdefault(("relay", r[0]), []).append(float(r[1]))

    checks = [
        ("price", "price_percentiles", "price_percentiles_approx",
         {"p50": 0.5, "p90": 0.9, "p99": 0.99}),
        ("relay", "ml_relay_latency", "ml_relay_latency_approx",
         {"p50_delay": 0.5, "p90_delay": 0.9, "p99_delay": 0.99}),
    ]
    for family, exact_name, approx_name, qmap in checks:
        exact = {r[0]: r.asDict() for r in Q.REGISTRY[exact_name].fn(spark, SF).collect()}
        approx = {r[0]: r.asDict() for r in Q.REGISTRY[approx_name].fn(spark, SF).collect()}
        assert set(exact) == set(approx), exact_name
        for key, ar in approx.items():
            vals = sorted(raw[(family, key)])
            n = len(vals)
            for col, q in qmap.items():
                if col not in ar:
                    continue
                av = ar[col]
                # membership: the sketch returns an actual data value
                # (compare at the query's 4-decimal rounding)
                nearest = min(range(n), key=lambda i: abs(vals[i] - av))
                assert abs(vals[nearest] - av) < 1e-3, (approx_name, key, col)
                # rank: within the accuracy bound of the target rank
                target = q * (n - 1)
                slack = 1 + n / 10_000
                lo = min(i for i in range(n) if abs(vals[i] - av) < 1e-3)
                hi = max(i for i in range(n) if abs(vals[i] - av) < 1e-3)
                assert lo - slack <= target <= hi + slack, (
                    approx_name, key, col, av, target, (lo, hi), n
                )
            # non-percentile aggregates are exact and must match exactly
            er = exact[key]
            for col, ev in er.items():
                if col in qmap or not isinstance(ev, (int, float)):
                    continue
                assert ar[col] == pytest.approx(ev, rel=1e-9), (approx_name, key, col)


def test_incremental_ivf_update_matches_one_shot_build(spark, tmp_path):
    """Index maintenance: absorbing the corpus in waves under a frozen
    coarse quantizer yields query results identical to a one-shot
    build, and replaying a wave is a no-op (per-cell neighbor dedup)."""
    import shutil

    from pyspark.sql import functions as F

    from maillog2db_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    full = str(tmp_path / "ivf_full")
    inc = str(tmp_path / "ivf_inc")
    sim.build_ivf_index(spark, sf, full)
    # frozen quantizer: the incremental index shares the trained centroids
    shutil.copytree(f"{full}/centroids", f"{inc}/centroids")

    corpus = sim._embeddings(spark, sf).filter(F.col("vec_id") >= sim.N_QUERIES)
    wave_a = corpus.filter("vec_id % 2 = 0")
    wave_b = corpus.filter("vec_id % 2 = 1")
    sim.update_ivf_index(spark, inc, wave_a)  # cells dir absent → bootstrap
    sim.update_ivf_index(spark, inc, wave_b)  # bucket-merge path

    queries = sim._embeddings(spark, sf).filter(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    want = {(r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in sim.query_ivf_index(spark, full, queries).collect()}
    got = {(r.query_id, r.neighbor_id, r.cosine, r.rank)
           for r in sim.query_ivf_index(spark, inc, queries).collect()}
    assert got == want and got

    sim.update_ivf_index(spark, inc, wave_b)  # replay — must change nothing
    again = {(r.query_id, r.neighbor_id, r.cosine, r.rank)
             for r in sim.query_ivf_index(spark, inc, queries).collect()}
    assert again == want


def test_generic_asof_join_matches_naive(spark):
    """asof_join (generic merge_asof contract) ≡ a naive per-row scan,
    across directions and exact-match settings, with whole-row value
    atomicity (both value columns come from the same matched row)."""
    import random

    from maillog2db_spark.operators import temporal

    rng = random.Random(3)
    quotes = [
        (sym, t, round(rng.uniform(10, 99), 2), rng.randint(1, 9))
        for sym in ("aa", "bb", "cc")
        for t in sorted(rng.sample(range(1000), 40))
    ]
    trades = [
        (i, rng.choice(("aa", "bb", "cc", "dd")), rng.randrange(1000))
        for i in range(120)
    ]
    qdf = spark.createDataFrame(quotes, "sym string, qts long, px double, sz int")
    tdf = spark.createDataFrame(trades, "trade_id long, sym string, tts long")

    for direction in ("backward", "forward"):
        for exact in (True, False):
            got = {
                r.trade_id: (r.px, r.sz)
                for r in temporal.asof_join(
                    tdf, qdf, by=["sym"], left_ts="tts", right_ts="qts",
                    value_cols=["px", "sz"], direction=direction,
                    allow_exact_matches=exact,
                ).collect()
            }
            want = {}
            for trade_id, sym, tts in trades:
                if direction == "backward":
                    cand = [q for q in quotes if q[0] == sym
                            and (q[1] <= tts if exact else q[1] < tts)]
                    best = max(cand, key=lambda q: q[1], default=None)
                else:
                    cand = [q for q in quotes if q[0] == sym
                            and (q[1] >= tts if exact else q[1] > tts)]
                    best = min(cand, key=lambda q: q[1], default=None)
                want[trade_id] = (best[2], best[3]) if best else (None, None)
            assert got == want, (direction, exact)


def test_generic_range_join_matches_naive(spark):
    """range_join's two-cell bucket decomposition ≡ naive filtering,
    including negative lower bounds (look-behind) and boundary gaps."""
    import random

    from maillog2db_spark.operators import temporal

    rng = random.Random(5)
    lrows = [(i, rng.choice("xyz"), rng.randrange(500)) for i in range(80)]
    rrows = [(j, rng.choice("xyz"), rng.randrange(500)) for j in range(80)]
    l = spark.createDataFrame(lrows, "lid long, k string, lts long")
    r = spark.createDataFrame(rrows, "rid long, k string, rts long")

    for lo, hi in [(0, 50), (-30, 30), (-60, -10), (0, 1)]:
        got = {
            (x.lid, x.rid)
            for x in temporal.range_join(
                l, r, by=["k"], left_ts="lts", right_ts="rts", lower=lo, upper=hi
            ).collect()
        }
        want = {
            (lid, rid)
            for lid, lk, lts in lrows
            for rid, rk, rts in rrows
            if lk == rk and lo < rts - lts <= hi
        }
        assert got == want, (lo, hi)
        # exactly-once: collect as list too
        n = temporal.range_join(
            l, r, by=["k"], left_ts="lts", right_ts="rts", lower=lo, upper=hi
        ).count()
        assert n == len(want), (lo, hi)


def test_range_join_exact_beyond_double_precision(spark):
    """Cell assignment is exact integer math: timestamps past 2^53
    (epoch-nanos magnitudes) and negative timestamps still pair
    correctly — the old double-division floor misassigned cells there."""
    import random

    from maillog2db_spark.operators import temporal

    rng = random.Random(11)
    base = 1 << 60  # far beyond double's 2^53 integer-exact range
    lrows = [(i, "k", base + rng.randrange(500)) for i in range(40)]
    lrows += [(100 + i, "k", -base + rng.randrange(500)) for i in range(40)]
    rrows = [(j, "k", base + rng.randrange(500)) for j in range(40)]
    rrows += [(100 + j, "k", -base + rng.randrange(500)) for j in range(40)]
    l = spark.createDataFrame(lrows, "lid long, k string, lts long")
    r = spark.createDataFrame(rrows, "rid long, k string, rts long")

    for lo, hi in [(0, 37), (-25, 25)]:
        got = {
            (x.lid, x.rid)
            for x in temporal.range_join(
                l, r, by=["k"], left_ts="lts", right_ts="rts", lower=lo, upper=hi
            ).collect()
        }
        want = {
            (lid, rid)
            for lid, _, lts in lrows
            for rid, _, rts in rrows
            if lo < rts - lts <= hi
        }
        assert got == want, (lo, hi)


# --- r4: semantic dedup / sliding windows / shard manifest -------------------


def test_semdedup_decision_invariants(spark):
    """One decision row per vector; every drop names a strictly lower
    id in the same cell, and — since semdedup's blocking (cell AND
    bucket) refines cosine_neardup's (bucket only) at the same
    threshold — every (dup_of, vec_id) edge must appear among the
    cosine near-dup pairs."""
    from maillog2db_spark import io as mio

    out = similarity.semantic_dedup(spark, SF).collect()
    n = mio.load(spark, SF, "embeddings").count()
    assert len(out) == n
    by_id = {r.vec_id: r for r in out}
    pairs = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_neardup_pairs(spark, SF).collect()
    }
    for r in out:
        if r.kept:
            assert r.dup_of is None
        else:
            assert r.dup_of is not None and r.dup_of < r.vec_id
            assert by_id[r.dup_of].cell == r.cell
            assert (r.dup_of, r.vec_id) in pairs


def test_semdedup_drops_planted_exact_duplicates(spark, tmp_path):
    """Planted exact-duplicate vectors always collide in both blocking
    keys (same cell, same bucket, cosine 1.0), so the higher ids must
    be dropped with dup_of = the group minimum; distinct near-orthogonal
    vectors survive."""
    import math

    rows = []
    # 12 deterministic base vectors across 2 labels: one-hot-ish,
    # pairwise cosine ≈ 0 — far below the threshold
    for i in range(12):
        v = [0.0] * 64
        v[i] = 1.0
        v[63] = 0.01 * (i + 1)
        rows.append((i, v, i % 2))
    # ids 100/101 duplicate vector 3; id 200 duplicates vector 7
    base3 = [0.0] * 64
    base3[3], base3[63] = 1.0, 0.04
    base7 = [0.0] * 64
    base7[7], base7[63] = 1.0, 0.08
    rows += [(100, base3, 1), (101, base3, 1), (200, base7, 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/embeddings.parquet")
    out = {r.vec_id: r for r in similarity.semantic_dedup(spark, sf).collect()}
    assert out[3].kept  # group minimum survives
    assert not out[100].kept and out[100].dup_of == 3
    assert not out[101].kept and out[101].dup_of == 3
    assert not out[200].kept and out[200].dup_of == 7
    for i in range(12):
        if i in (3, 7):
            continue
        assert out[i].kept and out[i].dup_of is None


def test_sliding_hourly_invariants(spark):
    """Every event lands in exactly SLIDE_FACTOR overlapping windows,
    and the hour-aligned slice of the sliding result IS the tumbling
    result (tumbling = the slide-equals-size degenerate case)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import windows as W

    slid = W.sliding_hourly(spark, SF).collect()
    n = mio.load_events(spark, SF).count()
    assert sum(r.n_events for r in slid) == W.SLIDE_FACTOR * n
    hour_aligned = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in slid
        if r.window_start.minute == 0
    }
    tumbling = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in W.tumbling_hourly(spark, SF).collect()
    }
    assert hour_aligned == tumbling


def test_shard_assignment_partitions_the_corpus(spark):
    """Shards tile the corpus: counts sum to the doc count, ids stay in
    range, and the checksum is order-independent (recomputing from a
    differently-partitioned scan is identical by construction — the
    oracle gate pins the values; here we pin the tiling)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import sampling as S

    rows = S.shard_assignment(spark, SF).collect()
    docs = mio.load(spark, SF, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.shard_id for r in rows} <= set(range(S.N_SHARDS))
    assert all(r.min_doc_id <= r.max_doc_id for r in rows)


def test_cms_overcount_guarantee_and_topk(spark):
    """CMS property: the sketch estimate never undercounts (est_n >=
    true_n for every reported token), and on a corpus whose vocabulary
    is far smaller than D x W the top-k by estimate matches the exact
    top-k."""
    from maillog2db_spark.operators import text as tx

    rows = tx.cms_heavy_hitters(spark, SF).collect()
    assert len(rows) == tx.CMS_TOP_K
    assert all(r.est_n >= r.true_n for r in rows)
    assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == list(
        range(1, tx.CMS_TOP_K + 1)
    )


def test_pca_components_match_numpy_direct(spark):
    """The distributed covariance + driver eigensolve must agree with
    numpy computing both steps directly on the collected corpus —
    eigenvalues to fixed-point tolerance (the 1e-12 quantization is the
    only divergence source) and components up to the shared sign
    convention."""
    import numpy as np

    from maillog2db_spark import io as mio

    w, comps = similarity.pca_components(spark, SF, k=2)
    X = np.array(
        [r.embedding for r in mio.load(spark, SF, "embeddings").orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    mq = np.floor(X.mean(axis=0) * 1_000_000 + 0.5) / 1_000_000
    C = (X - mq).T @ (X - mq) / X.shape[0]
    w_ref, v_ref = np.linalg.eigh(C)
    order = np.argsort(w_ref)[::-1][:2]
    assert np.allclose(w, w_ref[order], atol=1e-9)
    for got, idx in zip(comps, order):
        ref = v_ref[:, idx]
        pivot = int(np.argmax(np.abs(ref)))
        if ref[pivot] < 0:
            ref = -ref
        assert np.allclose(got, ref, atol=1e-6)


def test_concurrent_sessions_sweep_invariants(spark):
    """Sweep-line sanity: depth is non-negative at every boundary, the
    final boundary closes back to zero, and the peak equals the true
    maximum interval overlap recomputed naively from the session
    table."""
    from maillog2db_spark.operators import windows as W

    rows = sorted(W.concurrent_sessions(spark, SF).collect(), key=lambda r: r.ts)
    assert all(r.depth >= 0 for r in rows)
    assert rows[-1].depth == 0
    sessions = W.sessionize(spark, SF).collect()
    peak = max(rows, key=lambda r: r.depth).depth
    boundaries = [r.ts for r in rows]
    naive_peak = max(
        sum(1 for s in sessions if s.session_start <= t <= s.session_end)
        for t in boundaries
    )
    assert peak == naive_peak


def test_leakage_safe_split_colocated_duplicates(spark, tmp_path):
    """Duplicate-leakage guard: byte-identical copies of a document
    must ALL land in the same split (the per-doc split column derives
    from the content fingerprint), and the three splits partition the
    corpus."""
    from maillog2db_spark.operators import sampling as S

    rows = []
    did = 0
    for g in range(200):  # 200 content groups, 1-3 copies each
        text = f"group {g} content " + "tok " * (g % 5)
        for _ in range(1 + g % 3):
            rows.append((did, text, "en" if g % 2 else "de", "s0", len(text)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = S.leakage_safe_split(spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in out) == len(rows)
    # every split has at least a group at this corpus size and rates?
    # not guaranteed for val/test at 5% — instead pin the invariant the
    # operator exists for: per (split, lang) docs >= groups, and the
    # total group count equals the distinct content count (no group in
    # two splits for its lang)
    assert all(r.n_docs >= r.n_groups for r in out)
    n_groups_total = sum(r.n_groups for r in out)
    distinct_contents = df.select("lang", "text").distinct().count()
    assert n_groups_total == distinct_contents


def test_sorted_neighborhood_finds_planted_dups(spark, tmp_path):
    """Exact duplicates share the canonical sort key, so they are
    always adjacent in the neighborhood ordering and must be reported
    at Jaccard ppm 1e6; a reordered-token variant (same key, different
    shingles) is adjacent but only reported if its shingle Jaccard
    clears the threshold; unrelated docs are not paired."""
    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon zeta",      # exact dup of 0
        2: "alpha beta gamma delta epsilon zeta",      # exact dup of 0
        3: "zeta epsilon delta gamma beta alpha",      # same token SET as 0
        4: "one two three four five six seven",        # unrelated
        5: "red green blue cyan magenta yellow",       # unrelated
    }
    rows = [(i, t, "en", "s0", len(t)) for i, t in texts.items()]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    sn = {
        (r.doc_a, r.doc_b): r.jaccard_ppm
        for r in dedup.sorted_neighborhood_pairs(spark, str(tmp_path)).collect()
    }
    assert sn.get((0, 1)) == 1_000_000
    assert sn.get((1, 2)) == 1_000_000
    assert sn.get((0, 2)) == 1_000_000  # within the W=3 neighborhood
    # the reordered variant shares no 3-shingles with the originals:
    # adjacent but below threshold, so NOT reported
    assert (2, 3) not in sn and (0, 3) not in sn
    # unrelated docs never pair above threshold
    assert not any(4 in p or 5 in p for p in sn)


def test_minhash_estimate_calibration(spark):
    """Estimator sanity on real candidates: estimates are exact
    multiples of 1e6/N_HASHES, every value is a valid ppm, and the mean
    absolute error stays within twice the single-component granularity.
    Note what is deliberately NOT asserted: a full signature match does
    NOT imply identical shingle sets (at J=0.9 all 8 components agree
    with probability ~0.47) — which is exactly the statistical fact
    that makes 8 components a blocking key but NOT a verification
    substitute, and the reason this table exists."""
    rows = dedup.minhash_estimate_vs_exact(spark, SF).collect()
    assert rows
    step = 1_000_000 // dedup.N_HASHES
    assert all(r.est_ppm % step == 0 for r in rows)
    assert all(0 <= r.est_ppm <= 1_000_000 and 0 <= r.exact_ppm <= 1_000_000 for r in rows)
    assert all(r.err_ppm == abs(r.est_ppm - r.exact_ppm) for r in rows)
    # the Carter-Wegman components (mh_i = min(h1 + i*h2)) are NOT
    # independent permutations: a shared argmin shingle under h1 tends
    # to repeat across i, so chance band collisions can carry inflated
    # estimates — the calibration table makes that variance VISIBLE
    # (which is the point). The robust contract is discrimination: the
    # estimator must separate the verified-similar family from chance
    # collisions.
    hi = [r.est_ppm for r in rows if r.exact_ppm >= dedup.JACCARD_THRESHOLD * 1_000_000]
    lo = [r.est_ppm for r in rows if r.exact_ppm < dedup.JACCARD_THRESHOLD * 1_000_000]
    assert hi, "fixture plants near-dups that must reach candidates"
    if lo:
        assert sum(hi) / len(hi) > sum(lo) / len(lo)


def test_weighted_sample_is_without_replacement_and_weight_biased(spark):
    """Efraimidis-Spirakis invariants: exactly SAMPLE_K distinct docs
    (no replacement), deterministic across invocations (content-hash
    keys, no RNG stream), and weight-proportional — the char-mass of
    the sample skews above the corpus mean because longer docs carry
    proportionally larger inclusion probability."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import sampling as S

    rows = S.weighted_sample(spark, SF).collect()
    assert len(rows) == S.SAMPLE_K
    assert len({r.doc_id for r in rows}) == S.SAMPLE_K
    rows2 = S.weighted_sample(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    docs = mio.load(spark, SF, "documents")
    corpus_mean = docs.agg({"n_chars": "avg"}).first()[0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_markov_transitions_row_stochastic(spark):
    """The transition matrix is row-stochastic (each prev_type's
    probabilities sum to 1 within rounding grid), counts are positive,
    and every state seen in the matrix is a real event type."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import windows as W

    rows = W.markov_transitions(spark, SF).collect()
    assert rows, "matrix must be non-empty at sf0.001"
    by_prev: dict = {}
    for r in rows:
        assert r.n > 0
        by_prev.setdefault(r.prev_type, 0.0)
        by_prev[r.prev_type] += r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-6, (prev, total)
    types = {
        r[0] for r in mio.load_events(spark, SF).select("event_type").distinct().collect()
    }
    assert {r.prev_type for r in rows} <= types
    assert {r.event_type for r in rows} <= types


def test_kmeans_lloyd_invariants(spark):
    """Lloyd's guarantees on the fixed-iteration trainer: clusters
    tile the corpus (counts sum to |embeddings|), every final cluster
    is one of the init cells, and total inertia does not increase
    when the iteration count grows (monotone descent — the rounding
    grid is 1e-6, far below the per-step improvements here)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    rows = sim.kmeans(spark, SF).collect()
    n_emb = mio.load(spark, SF, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_emb
    labels = {
        r[0] for r in mio.load(spark, SF, "embeddings").select("label").distinct().collect()
    }
    assert {r.cluster for r in rows} <= labels

    # one-iteration inertia (assignment against the init centroids)
    e = sim._embeddings(spark, SF)
    c0 = sim.centroids_with_norms(spark, SF).select(
        "cell", sim._round_arr(F.col("centroid")).alias("centroid")
    )
    a1 = sim._kmeans_assign(e, c0)
    inertia1 = a1.agg(
        F.sum(F.round(F.col("d2r") * 1_000_000).cast("bigint"))
    ).first()[0]
    inertia2 = sum(r.inertia_ppm for r in rows)
    assert inertia2 <= inertia1


def test_zorder_layout_concentrates_box_queries(spark, tmp_path):
    """Data-skipping effectiveness: after z-order clustering, a 2-D box
    predicate (price range AND date range) finds all its rows in a
    small fraction of files, while the same data laid out by orderkey
    spreads them across nearly every file. Files with zero matching
    rows are exactly the files parquet min/max stats let the reader
    skip. Also pins that the layout is lossless (same matching rows)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import layout as L

    orders = mio.load(spark, SF, "orders")
    n_files = 16
    zdir, ndir = str(tmp_path / "z"), str(tmp_path / "naive")
    L.write_zordered(orders, zdir, n_files)
    (
        orders.repartitionByRange(n_files, "o_orderkey")
        .write.mode("overwrite").parquet(ndir)
    )

    pred = (
        (F.col("o_totalprice") >= 100_000)
        & (F.col("o_totalprice") < 160_000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    z_touched, z_total = L.files_touched(spark, zdir, pred)
    n_touched, n_total = L.files_touched(spark, ndir, pred)
    assert z_total == n_files and n_total == n_files

    matching = orders.filter(pred).count()
    assert matching > 0, "box must select something at sf0.001"
    assert spark.read.parquet(zdir).filter(pred).count() == matching
    # the box covers ~12% of price range x ~14% of date range; z-order
    # must confine it to a minority of files while the orderkey layout
    # (uncorrelated with either dimension) smears it over ~all of them
    assert z_touched <= n_files // 2
    assert z_touched < n_touched


def test_revenue_ewma_first_day_and_bounds(spark):
    """EWMA sanity: the earliest day's smoothed value is exactly
    alpha x that day's revenue (empty history), every value is
    positive, and the smoothed series never exceeds alpha x the
    trailing-frame revenue mass (weights <= 1)."""
    from maillog2db_spark.operators import windows as W

    rows = sorted(W.revenue_ewma(spark, SF).collect(), key=lambda r: r.day)
    assert rows
    first = rows[0]
    assert abs(first.ewma - W.EWMA_ALPHA * first.revenue) < 1e-6
    assert all(r.ewma > 0 for r in rows)
    total = sum(r.revenue for r in rows)
    assert all(r.ewma <= W.EWMA_ALPHA * total for r in rows)


def test_incremental_zorder_optimize_restores_skipping(spark, tmp_path):
    """OPTIMIZE-style maintenance: unclustered appends degrade file
    skipping in their partitions; re-clustering ONLY the touched month
    directories restores it, leaves every untouched partition's files
    physically alone, and loses no rows."""
    import glob as _g
    import os as _os

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import layout as L

    orders = mio.load(spark, SF, "orders")
    in_window = (F.col("o_orderdate") >= F.lit("1997-01-01")) & (
        F.col("o_orderdate") < F.lit("1997-03-01")
    )
    base = orders.filter(~in_window)
    path = str(tmp_path / "t")
    L.write_zordered_partitioned(base, path, n_files=24)

    def snapshot(months):
        out = {}
        for m in months:
            for f in _g.glob(f"{path}/{L.MONTH_COL}={m}/*.parquet"):
                out[f] = _os.stat(f).st_mtime_ns
        return out

    untouched_before = snapshot(["1996-05", "1998-07", "2000-11"])

    # ingest the two missing months as THREE interleaved unclustered
    # appends — each month directory accumulates 3 price-mixed files
    wave = orders.filter(in_window)
    for i in range(3):
        L.append_unclustered(wave.filter(F.col("o_orderkey") % 3 == i).coalesce(1), path)

    # price >= 32*PRICE_STEP sets the TOP interleave bit, so the
    # predicate selects a contiguous z-range regardless of day bits —
    # exactly the file-skipping shape the layout promises
    pred = F.col("o_totalprice") >= 32 * L.PRICE_STEP
    jan = (F.col(L.MONTH_COL) == "1997-01") & pred
    jan_files = lambda: len(_g.glob(f"{path}/{L.MONTH_COL}=1997-01/*.parquet"))
    t_before, _ = L.files_touched(spark, path, jan)
    # unclustered appends: price is uncorrelated with arrival order, so
    # the box finds rows in EVERY January file — zero skipping
    assert t_before == jan_files() == 3

    L.optimize_partitions(spark, path, ["1997-01", "1997-02"], files_per_month=3)
    t_after, _ = L.files_touched(spark, path, jan)

    assert spark.read.parquet(path).count() == orders.count()
    # re-clustered files are price-runs: the box now skips files
    assert t_after < jan_files()
    assert untouched_before == snapshot(["1996-05", "1998-07", "2000-11"])


def test_span_scrub_removes_copied_spans(spark, tmp_path):
    """Planted-duplication semantics: the first writer keeps its text
    verbatim; a later doc that embeds the first doc's passage loses
    exactly that span (plus boundary shingles) while its fresh prose
    survives; token accounting is exact."""
    from maillog2db_spark.operators import corpus_analytics as ca

    a = "one two three four five six"
    b = "fresh opening words " + a + " fresh closing words"
    c = "wholly original content nine ten eleven"
    rows = [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b)), (2, c, "en", "s", len(c))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in ca.span_scrub(spark, str(tmp_path)).collect()}
    assert out[0].n_removed == 0 and out[0].scrubbed == a
    assert out[2].n_removed == 0 and out[2].scrubbed == c
    # doc 1: the copied six-token span is covered; both flanking fresh
    # phrases keep the tokens outside any duplicated shingle
    assert out[1].n_removed >= 6
    kept = out[1].scrubbed.split()
    assert "fresh" in kept and "opening" in kept and "closing" in kept
    assert "three" not in kept and "four" not in kept
    for r in out.values():
        assert len(r.scrubbed.split()) == r.n_toks - r.n_removed


def test_interleave_bits_is_injective_and_per_axis_monotone(spark):
    """Morton-key contract behind the skipping guarantees: the
    interleave is a bijection onto [0, 4^ZBITS) (no two grid cells
    share a key — a collision would co-locate unrelated data), and
    fixing one axis makes the key monotone in the other (an axis range
    predicate maps to a bounded set of z-ranges)."""
    from maillog2db_spark.operators import layout as L

    n = 1 << L.ZBITS
    grid = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(n)], "a long, b long"
    )
    keys = grid.select(
        "a", "b", L.interleave_bits(F.col("a"), F.col("b")).alias("z")
    ).collect()
    zs = {(r.a, r.b): r.z for r in keys}
    assert sorted(zs.values()) == list(range(n * n))
    for fixed in (0, 5, n - 1):
        row = [zs[(a, fixed)] for a in range(n)]
        col = [zs[(fixed, b)] for b in range(n)]
        assert row == sorted(row) and col == sorted(col)


def test_basket_affinity_lift_semantics(spark):
    """Association-mining invariants: pairs are canonical (a < b),
    support meets the threshold, and lift matches the independent
    recount n_ab * N / (n_a * n_b) computed from scratch."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import corpus_analytics as ca

    rows = ca.basket_affinity(spark, SF).collect()
    assert rows
    li = (
        mio.load(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import Counter, defaultdict

    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    part_n = Counter(p for b in baskets.values() for p in b)
    pair_n = Counter()
    for b in baskets.values():
        s = sorted(b)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_n[(s[i], s[j])] += 1
    n_orders = len(baskets)
    expected = {
        k: v for k, v in pair_n.items() if v >= ca.BASKET_MIN_SUPPORT
    }
    got = {(r.part_a, r.part_b): r for r in rows}
    assert set(got) == set(expected)
    for (pa, pb), r in got.items():
        assert pa < pb and r.n_ab == expected[(pa, pb)]
        lift = r.n_ab * n_orders / (part_n[pa] * part_n[pb])
        assert abs(r.lift - lift) < 1e-6


def test_referential_integrity_clean_star_schema(spark):
    """The generated star schema is referentially clean: all seven
    relationships report zero orphans and zero NULL keys, and child
    counts match the raw tables."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import relational_ext as rex

    rows = {r.relationship: r for r in rex.referential_integrity(spark, SF).collect()}
    assert len(rows) == len(rex._FK_RELATIONSHIPS)
    for r in rows.values():
        assert r.n_orphans == 0 and r.n_null_keys == 0
    assert rows["lineitem->orders"].n_child == mio.load(spark, SF, "lineitem").count()

    # planted orphan detection: corrupt one child key in memory and
    # recount that relationship by hand through the same anti-join shape
    li = mio.load(spark, SF, "lineitem").select("l_orderkey")
    corrupted = li.withColumn(
        "l_orderkey",
        F.when(F.monotonically_increasing_id() == 0, F.lit(10**12)).otherwise(
            F.col("l_orderkey")
        ),
    )
    orders = mio.load(spark, SF, "orders").select("o_orderkey")
    orphans = corrupted.join(
        orders, corrupted.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    assert orphans == 1


def test_ann_recall_bounds_and_exact_self_agreement(spark):
    """Recall rows cover every query, land in [0, 1], and n_hit never
    exceeds TOP_K; the registered value must equal a recount from the
    two component rankings."""
    from maillog2db_spark.operators import similarity as sim

    rows = {r.query_id: r for r in sim.ann_recall(spark, SF).collect()}
    assert set(rows) == set(range(sim.N_QUERIES))
    ann = {
        (r.query_id, r.neighbor_id) for r in sim.ann_ivf_topk(spark, SF).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id) for r in sim.knn_bruteforce(spark, SF).collect()
    }
    for q, r in rows.items():
        want = len({n for (qq, n) in ann if qq == q} & {n for (qq, n) in exact if qq == q})
        assert r.n_hit == want
        assert 0 <= r.n_hit <= sim.TOP_K
        assert abs(r.recall - r.n_hit / sim.TOP_K) < 1e-9


def test_pq_encode_optimality_and_shape(spark):
    """PQ invariants: every vector gets a PQ_M-field code over valid
    codebook ids, and the chosen reconstruction error is never worse
    than force-assigning each subvector to the vector's OWN label
    codeword (argmin optimality against a natural competitor)."""
    import numpy as np

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    rows = {r.vec_id: r for r in sim.pq_encode(spark, SF).collect()}
    emb = mio.load(spark, SF, "embeddings").collect()
    assert set(rows) == {r.vec_id for r in emb}
    labels = {r.label for r in emb}

    # rebuild the codebooks exactly as the operator defines them
    by_lm: dict = {}
    for r in emb:
        v = np.array(r.embedding, dtype=np.float64)
        for m in range(sim.PQ_M):
            by_lm.setdefault((r.label, m), []).append(
                v[m * sim.PQ_D : (m + 1) * sim.PQ_D]
            )
    cb = {k: np.round(np.mean(vs, axis=0), 6) for k, vs in by_lm.items()}

    for r in emb:
        got = rows[r.vec_id]
        codes = [int(c) for c in got.pq_code.split("-")]
        assert len(codes) == sim.PQ_M and all(c in labels for c in codes)
        v = np.array(r.embedding, dtype=np.float64)
        own_ppm = 0
        for m in range(sim.PQ_M):
            s = v[m * sim.PQ_D : (m + 1) * sim.PQ_D]
            d2 = round(float(np.sum((s - cb[(r.label, m)]) ** 2)), 6)
            own_ppm += round(d2 * 1_000_000)
        assert got.recon_ppm <= own_ppm


def test_pq_adc_matches_lookup_table_recount(spark):
    """ADC invariants: every query gets TOP_K ranked neighbors with
    non-decreasing quantized distance, and each reported adc_ppm equals
    the numpy recount of the M table lookups for that (query, neighbor)
    pair through the same codebooks and rounding points."""
    import numpy as np

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    rows = sim.pq_adc_topk(spark, SF).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(sim.N_QUERIES))

    emb = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
           for r in mio.load(spark, SF, "embeddings").collect()}
    by_lm: dict = {}
    for v, lab in emb.values():
        for m in range(sim.PQ_M):
            by_lm.setdefault((lab, m), []).append(v[m * sim.PQ_D:(m + 1) * sim.PQ_D])
    cb = {k: np.round(np.mean(vs, axis=0), 6) for k, vs in by_lm.items()}
    codes = {int(r.vec_id): [int(c) for c in r.pq_code.split("-")]
             for r in sim.pq_encode(spark, SF).collect()}

    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, sim.TOP_K + 1))
        dists = [r.adc_ppm for r in rs]
        assert dists == sorted(dists)
        qv = emb[q][0]
        for r in rs:
            want = 0
            for m in range(sim.PQ_M):
                s = qv[m * sim.PQ_D:(m + 1) * sim.PQ_D]
                d2 = round(float(np.sum((s - cb[(codes[r.neighbor_id][m], m)]) ** 2)), 6)
                want += round(d2 * 1_000_000)
            assert r.adc_ppm == want


def test_daily_reconciliation_covers_both_calendars(spark):
    """Full-outer semantics: the day set is exactly the union of the
    two sides' calendars, one-sided days carry the right status, and
    per-side totals are conserved."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import relational_ext as rex

    rows = rex.daily_reconciliation(spark, SF).collect()
    o = mio.load(spark, SF, "orders")
    li = mio.load(spark, SF, "lineitem")
    o_days = {r[0].strftime("%Y-%m-%d") for r in
              o.select(F.col("o_orderdate").cast("date")).distinct().collect()}
    l_days = {r[0].strftime("%Y-%m-%d") for r in
              li.select(F.col("l_shipdate").cast("date")).distinct().collect()}
    assert {r.day for r in rows} == o_days | l_days
    assert sum(r.n_orders for r in rows) == o.count()
    assert sum(r.n_shipped for r in rows) == li.count()
    statuses = {r.status for r in rows}
    assert "both" in statuses and "ship_only" in statuses
    for r in rows:
        if r.status == "ship_only":
            assert r.n_orders == 0 and r.day in l_days and r.day not in o_days
        elif r.status == "order_only":
            assert r.n_shipped == 0


def test_ivfpq_adc_matches_numpy_recount(spark):
    """IVFADC differential: recompute the whole path from scratch in
    numpy — coarse-cell assignment, ppm residuals, residual codebooks,
    code assignment, per-(query, probed-cell) lookup tables, ADC sums,
    top-k — and demand the registered query's output exactly."""
    import numpy as np

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    def r6(x):  # HALF_UP to 6 places, matching both engines' round()
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def rint(x):  # HALF_UP (away from zero) to integer
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    emb = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
           for r in mio.load(spark, SF, "embeddings").collect()}
    labs = sorted({lab for _, lab in emb.values()})
    cents = {lab: np.mean([v for v, l in emb.values() if l == lab], axis=0)
             for lab in labs}

    def cell_ranking(v):
        nv = np.sqrt(v @ v)
        out = []
        for lab in labs:
            c = cents[lab]
            out.append((-float(r6(v @ c / (nv * np.sqrt(c @ c)))), lab))
        return [lab for _, lab in sorted(out)]

    corpus = {vid: ve for vid, ve in emb.items() if vid >= sim.N_QUERIES}
    cell_of = {vid: cell_ranking(v)[0] for vid, (v, _) in corpus.items()}
    resid = {vid: rint((v - cents[cell_of[vid]]) * 1_000_000)
             for vid, (v, _) in corpus.items()}

    by_lm: dict = {}
    for vid, r in resid.items():
        lab = corpus[vid][1]
        for m in range(sim.PQ_M):
            by_lm.setdefault((lab, m), []).append(r[m * sim.PQ_D:(m + 1) * sim.PQ_D])
    cb = {k: rint(np.mean(np.array(vs, dtype=np.float64), axis=0))
          for k, vs in by_lm.items()}

    code_of = {}
    for vid, r in resid.items():
        cw = []
        for m in range(sim.PQ_M):
            s = r[m * sim.PQ_D:(m + 1) * sim.PQ_D]
            _, best = min((int(np.sum((s - cb[(c, m)]) ** 2)), c)
                          for c in labs if (c, m) in cb)
            cw.append(best)
        code_of[vid] = cw

    expected = []
    for q in range(sim.N_QUERIES):
        qv = emb[q][0]
        probes = set(cell_ranking(qv)[:sim.N_PROBE])
        scored = []
        for vid in corpus:
            cell = cell_of[vid]
            if cell not in probes:
                continue
            qr = rint((qv - cents[cell]) * 1_000_000)
            adc = sum(int(np.sum((qr[m * sim.PQ_D:(m + 1) * sim.PQ_D]
                                  - cb[(code_of[vid][m], m)]) ** 2))
                      for m in range(sim.PQ_M))
            scored.append((adc, vid, cell))
        for rank, (adc, vid, cell) in enumerate(sorted(scored)[:sim.TOP_K], 1):
            expected.append((q, vid, cell, adc, rank))

    got = sorted((r.query_id, r.neighbor_id, r.cell, r.adc_d2, r.rank)
                 for r in sim.ivfpq_adc_topk(spark, SF).collect())
    assert got == sorted(expected)


def test_edit_distance_pairs_planted(spark, tmp_path):
    """Blocking losslessness + verify exactness across BOTH candidate
    paths: a long near pair (PassJoin segments), a short near pair
    (band path), a short-long boundary pair, a pair past the
    threshold, and unrelated docs — exact distances throughout."""
    from maillog2db_spark.operators import dedup as dd

    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet field at dawn")  # 98 chars
    near = base + " xx y"                # +5 chars: lev 5, at the cut
    far = base.replace("quick", "x" * 30)               # way past EDIT_T
    docs = [
        (0, base, "en", "s0", len(base)),
        (1, near, "en", "s0", len(near)),
        (2, far, "en", "s0", len(far)),
        (3, "zz", "en", "s0", 2),        # short path
        (4, "zzyx", "en", "s0", 4),      # short path: lev(zz, zzyx)=2
        (5, "abcdefghijk", "en", "s0", 11),    # short side of the boundary
        (6, "abcdefghijkxy", "en", "s0", 13),  # long side: lev 2, mixed pair
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    rows = {(r.doc_a, r.doc_b): r for r in
            dd.edit_distance_pairs(spark, str(tmp_path)).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert set(rows) == {(0, 1), (3, 4), (5, 6)}
    for a, b in rows:
        got = rows[(a, b)]
        assert got.lev == lev(docs[a][1], docs[b][1])
        assert (got.len_a, got.len_b) == (len(docs[a][1]), len(docs[b][1]))
    assert rows[(0, 1)].lev == 5 and rows[(5, 6)].lev == 2



def test_priority_islands_conserve_and_are_contiguous(spark):
    """Island rows partition each customer's orders: supports sum to
    the order count, regime ordinals are contiguous from 1, and
    consecutive regimes never share a priority (else they'd be one)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import windows as win

    rows = win.priority_islands(spark, SF).collect()
    n_orders = mio.load(spark, SF, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for regs in by_cust.values():
        regs.sort(key=lambda r: r.regime_seq)
        assert [r.regime_seq for r in regs] == list(range(1, len(regs) + 1))
        for a, b in zip(regs, regs[1:]):
            assert a.priority != b.priority
            assert a.valid_from <= a.valid_to <= b.valid_from


def test_mad_anomaly_resists_masking(spark, tmp_path):
    """The scenario MAD exists for: two huge outliers inflate sigma
    enough that the 3-sigma rule sees nothing, while the modified
    z-score flags exactly them."""
    import datetime

    from maillog2db_spark.operators import corpus_analytics as ca

    base = datetime.datetime(2024, 1, 1)
    # 8 gross outliers among 48: enough mass to inflate sigma to ~200,
    # putting their z-scores near 2.4 — under the 3-sigma cut
    vals = [10.0 + (i % 7) * 0.1 for i in range(40)] + [500.0, -480.0] * 4
    rows = [
        (i, base + datetime.timedelta(seconds=i), i % 5, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    outliers = set(range(40, 48))
    sigma = {r.event_id for r in ca.value_anomaly(spark, str(tmp_path)).collect()}
    mad = {r.event_id for r in ca.value_mad_anomaly(spark, str(tmp_path)).collect()}
    assert mad == outliers          # the robust rule flags all of them
    assert not sigma & outliers     # the sigma rule is fully masked


def test_bpe_train_merges_matches_local_trainer(spark, tmp_path):
    """The distributed 3-merge BPE trainer equals a single-process
    trainer with the same contract (frequency-weighted adjacent pair
    counts, (cnt, l, r)-max tiebreak, one replace-trick pass)."""
    from collections import Counter

    from maillog2db_spark.operators import text as tx

    corpus = ["low low low low lower lower lowest", "new newer newest low"]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(corpus)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    words = Counter(w for t in corpus for w in t.lower().split())
    seqs = {w: " ".join(w) for w in words}
    expected = []
    for step in range(1, tx.BPE_TRAIN_ITERS + 1):
        pc: Counter = Counter()
        for w, f in words.items():
            a = seqs[w].split(" ")
            for l, r in zip(a, a[1:]):
                pc[(l, r)] += f
        if not pc:
            break
        (l, r), cnt = max(pc.items(), key=lambda kv: (kv[1], kv[0]))
        expected.append((step, l, r, l + r, cnt))
        seqs = {
            w: (" " + s + " ").replace(f" {l} {r} ", f" {l}{r} ").strip()
            for w, s in seqs.items()
        }

    got = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in tx.bpe_train_merges(spark, str(tmp_path)).collect()
    )
    assert got == expected
    # with the largest-pair tiebreak, (o,w) beats (l,o) at count 7,
    # and the fused symbol chains into 'low' on the next step
    assert got[0][3] == "ow" and got[1][3] == "low"

    # encode path: per-doc symbol counts under the same merges
    enc_rows = {r.doc_id: (r.n_tokens, r.n_bpe_symbols, r.compression_ppm)
                for r in tx.bpe_encode_stats(spark, str(tmp_path)).collect()}
    for i, t in enumerate(corpus):
        toks_i = t.lower().split()
        n_sym = sum(len(seqs[w].split(" ")) for w in toks_i)
        assert enc_rows[i] == (len(toks_i), n_sym,
                               len(toks_i) * 1_000_000 // n_sym)


def test_abc_pareto_class_boundaries(spark):
    """Classes partition the ranking monotonically (A then B then C as
    rank increases), cumulative cents reconcile with the total, and the
    A head really carries <= 80% while A+B carries <= 95%."""
    from maillog2db_spark.operators import relational_ext as rex

    rows = sorted(rex.abc_pareto(spark, SF).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    classes = [r.abc_class for r in rows]
    assert classes == sorted(classes)  # A* then B* then C*
    total = sum(r.revenue_cents for r in rows)
    cum = 0
    for r in rows:
        cum += r.revenue_cents
        assert r.cum_share_ppm == cum * 1_000_000 // total
        if r.abc_class == "A":
            assert cum * 5 <= total * 4
        elif r.abc_class == "B":
            assert cum * 20 <= total * 19
    assert {"A", "B", "C"} == set(classes)


def test_cohort_ltv_reconciles(spark):
    """Cohort curves reconcile: revenue across all (cohort, age) cells
    equals total order revenue, cumulative sums are running totals,
    age-0 cells contain every cohort member's first order, and LTV is
    the exact integer division of cum revenue by cohort size."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import windows as win

    rows = win.cohort_ltv(spark, SF).collect()
    o = mio.load(spark, SF, "orders")
    total_cents = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    ).collect()[0][0]
    assert sum(r.revenue_cents for r in rows) == total_cents
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(rs[0].cohort_size for rs in by_cohort.values()) == n_cust
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.months_since)
        assert rs[0].months_since == 0
        assert rs[0].n_active == rs[0].cohort_size  # everyone buys at age 0
        cum = 0
        for r in rs:
            cum += r.revenue_cents
            assert r.cum_revenue_cents == cum
            assert r.ltv_cents_per_customer == cum // r.cohort_size


def test_multitouch_attribution_conserves_value(spark):
    """Each purchase's credited mass equals its micro value minus the
    integer-division remainder (< n_touches micros); purchases with no
    in-window click credit nothing; the pair set equals a naive scan."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import temporal as tmp

    e = [(r.event_id, r.user_id, r.event_type, r.ts, r.value)
         for r in mio.load_events(spark, SF).collect()]
    clicks = [(i, u, ts) for i, u, t, ts, v in e if t == "click"]
    purchases = [(i, u, ts, round(v * 1_000_000)) for i, u, t, ts, v in e
                 if t == "purchase"]
    win = tmp.ATTRIB_WINDOW_SEC
    touch: dict = {}
    for ci, cu, cts in clicks:
        for pi, pu, pts, pv in purchases:
            gap = (pts - cts).total_seconds()
            if cu == pu and 0 < gap <= win:
                touch.setdefault(pi, []).append(ci)
    expected: dict = {}
    for pi, cis in touch.items():
        pv = next(v for i, _, _, v in purchases if i == pi)
        # trunc-toward-zero division, matching both engines
        q = abs(pv) // len(cis)
        credit = q if pv >= 0 else -q
        for ci in cis:
            n, c = expected.get(ci, (0, 0))
            expected[ci] = (n + 1, c + credit)

    got = {r.click_id: (r.n_purchases_touched, r.credited_micro)
           for r in tmp.multitouch_attribution(spark, SF).collect()}
    assert got == expected


def test_truncation_recall_matches_numpy(spark):
    """The registered recall numbers equal a numpy recount of both
    rankings (round-6 cosine, neighbor-id ties), and recall is 1.0
    when the 'truncation' keeps every dimension."""
    import numpy as np

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in mio.load(spark, SF, "embeddings").collect()}

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def topk(dims):
        out = {}
        for q in range(sim.N_QUERIES):
            qv = emb[q][:dims]
            scored = sorted(
                (-r6(float(qv @ emb[n][:dims]
                           / (np.sqrt(qv @ qv) * np.sqrt(emb[n][:dims] @ emb[n][:dims])))), n)
                for n in emb if n >= sim.N_QUERIES
            )[: sim.TOP_K]
            out[q] = {n for _, n in scored}
        return out

    full, trunc = topk(sim.DIM), topk(sim.TRUNC_D)
    expected = {
        q: (len(full[q] & trunc[q]), len(full[q] & trunc[q]) * 1_000_000 // sim.TOP_K)
        for q in full
    }
    got = {r.query_id: (r.n_hits, r.recall_ppm)
           for r in sim.truncation_recall(spark, SF).collect()}
    assert got == expected


def test_int8_recall_matches_numpy(spark):
    """The int8-reconstruction recall eval equals a numpy recount:
    quantize every vector to round(x/scale)*scale (scale = absmax/127
    — embed_quantize_int8's exact grid), rank by round-6 cosine with
    neighbor-id ties on both the full and reconstructed sides, and
    compare hit sets."""
    import numpy as np

    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import similarity as sim

    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in mio.load(spark, SF, "embeddings").collect()}

    def recon(v):
        s = np.max(np.abs(v)) / 127.0
        if s <= 0:
            return np.zeros_like(v)
        # numpy rounds half-to-even; Spark/DuckDB round() is
        # half-away-from-zero — match the engines
        return np.sign(v) * np.floor(np.abs(v) / s + 0.5) * s

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def topk(table):
        out = {}
        for q in range(sim.N_QUERIES):
            qv = table[q]
            scored = sorted(
                (-r6(float(qv @ table[n]
                           / (np.sqrt(qv @ qv) * np.sqrt(table[n] @ table[n])))), n)
                for n in table if n >= sim.N_QUERIES
            )[: sim.TOP_K]
            out[q] = {n for _, n in scored}
        return out

    full = topk(emb)
    q8 = topk({k: recon(v) for k, v in emb.items()})
    expected = {
        q: (len(full[q] & q8[q]), len(full[q] & q8[q]) * 1_000_000 // sim.TOP_K)
        for q in full
    }
    got = {r.query_id: (r.n_hits, r.recall_ppm)
           for r in sim.int8_recall(spark, SF).collect()}
    assert got == expected


def test_persisted_ivfpq_index_matches_inline_and_prunes_partitions(spark, tmp_path):
    """build_ivfpq_index + query_ivfpq_index returns exactly the inline
    ivfpq_adc_topk results, and the codes scan carries a partition
    filter (only probed cell directories are read)."""
    from maillog2db_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(spark, sf, idx)
    queries = sim._embeddings(spark, sf).filter(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got_df = sim.query_ivfpq_index(spark, idx, queries)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan, plan
    got = {(r.query_id, r.neighbor_id, r.cell, r.adc_d2, r.rank)
           for r in got_df.collect()}
    want = {(r.query_id, r.neighbor_id, r.cell, r.adc_d2, r.rank)
            for r in sim.ivfpq_adc_topk(spark, sf).collect()}
    assert got == want and got


def test_langid_confusion_reconciles_with_per_doc(spark):
    """Cells sum to the corpus, per-label shares sum to ~1e6 (integer
    division slack < |cells|), and the diagonal equals the per-doc
    match count."""
    from maillog2db_spark.operators import text as tx

    per_doc = tx.language_id(spark, SF).collect()
    rows = tx.langid_confusion(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == len(per_doc)
    diag = sum(r.n_docs for r in rows if r.labeled_lang == r.guessed_lang)
    assert diag == sum(r.match for r in per_doc)
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.labeled_lang, []).append(r)
    for label, cells in by_label.items():
        assert all(c.n_labeled == cells[0].n_labeled for c in cells)
        assert sum(c.n_docs for c in cells) == cells[0].n_labeled
        s = sum(c.share_ppm for c in cells)
        assert 1_000_000 - len(cells) < s <= 1_000_000


def test_funnel_latency_matches_local_recount(spark):
    """The single-row funnel latencies equal a local recomputation of
    stage frontiers and interpolated percentiles."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import windows as win

    ev = [(r.user_id, r.event_type, r.ts) for r in mio.load_events(spark, SF).collect()]
    us = lambda ts: int(ts.timestamp() * 1_000_000)
    fv: dict = {}
    for u, t, ts in ev:
        if t == "view":
            fv[u] = min(fv.get(u, 10**30), us(ts))
    fc: dict = {}
    for u, t, ts in ev:
        if t == "click" and u in fv and us(ts) >= fv[u]:
            fc[u] = min(fc.get(u, 10**30), us(ts))
    fp: dict = {}
    for u, t, ts in ev:
        if t == "purchase" and u in fc and us(ts) >= fc[u]:
            fp[u] = min(fp.get(u, 10**30), us(ts))

    def pq(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo, hi = int(pos), min(int(pos) + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * (pos - lo), 4)

    vc = [(fc[u] - fv[u]) / 1e6 for u in fc]
    cp = [(fp[u] - fc[u]) / 1e6 for u in fp]
    r = win.funnel_latency(spark, SF).collect()[0]
    assert (r.n_viewed, r.n_clicked, r.n_purchased) == (len(fv), len(fc), len(fp))
    assert r.p50_view_to_click_sec == pq(vc, 0.5)
    assert r.p90_click_to_purchase_sec == pq(cp, 0.9)
    assert r.max_view_to_click_sec == round(max(vc), 4)


def test_basket_rules_directional_consistency(spark):
    """Every undirected affinity pair yields exactly its two directed
    rules, confidence is the exact ppm ratio against the antecedent's
    order count, and the asymmetry is real (confidences differ when
    the antecedents' supports do)."""
    from maillog2db_spark import io as mio
    from maillog2db_spark.operators import corpus_analytics as ca

    rules = {(r.antecedent, r.consequent): r
             for r in ca.basket_rules(spark, SF).collect()}
    aff = {(r.part_a, r.part_b): r.n_ab
           for r in ca.basket_affinity(spark, SF).collect()}
    assert set(rules) == {(a, b) for a, b in aff} | {(b, a) for a, b in aff}
    li = mio.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_part = {r.l_partkey: r.n for r in
              li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    asym = 0
    for (a, b), r in rules.items():
        assert r.confidence_ppm == r.n_ab * 1_000_000 // n_part[a]
        if n_part[a] != n_part[b]:
            asym += 1
    assert asym > 0


def test_distributed_cumulative_matches_single_partition_window(spark):
    """The two-phase global rank/cumsum must equal the single-partition
    Window it replaces — on adversarial input: negative values (the
    sweep-line deltas), duplicate order keys broken by a tiebreaker,
    desc ordering, and a partition count far above AND below the row
    count (empty range partitions / everything in one partition)."""
    import random

    from pyspark.sql import Window
    from maillog2db_spark.operators.windows import (
        distributed_cumulative,
        ntile_from_rank,
    )

    rng = random.Random(5)
    rows = [(i, rng.randint(-50, 50), rng.randint(0, 9)) for i in range(997)]
    df = spark.createDataFrame(rows, "id bigint, v bigint, k bigint")

    w = Window.orderBy(F.col("k").desc(), F.col("id"))
    want = sorted(
        (r.id, r.rank, r.cum)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rank"),
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        ).collect()
    )
    # 1 exercises the coalesced fast path (no sampling / offset jobs),
    # 7 the general multi-range path, 2000 empty range partitions
    for n_parts in (1, 7, 2000):
        got = sorted(
            (r.id, r._grank, r._gcum_v)
            for r in distributed_cumulative(
                df, [F.col("k").desc(), F.col("id")], sum_cols=("v",),
                n_parts=n_parts,
            ).collect()
        )
        assert got == want, n_parts

    # ntile_from_rank reproduces SQL ntile for every (N, n) shape:
    # N < n (one row per bucket), N % n == 0, and ragged fills
    for total in (3, 8, 997):
        sub = df.limit(total)
        wn = Window.orderBy(F.col("k").desc(), F.col("id"))
        want_nt = sorted(
            (r.id, r.nt)
            for r in sub.select("id", F.ntile(4).over(wn).alias("nt")).collect()
        )
        ranked = distributed_cumulative(
            sub, [F.col("k").desc(), F.col("id")], n_parts=5
        ).withColumn("n_total", F.lit(total).cast("bigint"))
        got_nt = sorted(
            (r.id, r.nt)
            for r in ranked.select(
                "id", ntile_from_rank("_grank", "n_total", 4).alias("nt")
            ).collect()
        )
        assert got_nt == want_nt, total


def test_quality_classifier_separates_planted_classes(spark, tmp_path):
    """The trained domain discriminator must actually discriminate on
    SEPARABLE data: a planted corpus where the bench source's docs are
    long multi-token text and the rest are short fragments. After
    CLS_ITERS GD steps every bench doc must outscore every non-bench
    doc (the features differ by construction, so a correct gradient
    direction yields a clean margin). Also pins determinism: training
    twice yields identical scores (integer weights, no RNG), and on
    the driver corpus — where sources are feature-identical by
    construction — training converges without flipping any score past
    the decision boundary spuriously."""
    from maillog2db_spark.operators import classifier as C
    from maillog2db_spark.operators.decontam import BENCH_SOURCE

    rows = []
    for i in range(60):
        long_text = " ".join(f"token{j}" for j in range(200))
        rows.append((i, "en", BENCH_SOURCE, long_text, len(long_text)))
    for i in range(60, 300):
        rows.append((i, "en", "srcX", "tiny bit", 8))
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = C.quality_classifier(spark, str(tmp_path)).collect()
    pos = [r.lr_score_ppm for r in out if r.source == BENCH_SOURCE]
    neg = [r.lr_score_ppm for r in out if r.source != BENCH_SOURCE]
    assert len(pos) == 60 and len(neg) == 240
    assert min(pos) > max(neg)  # clean margin on separable data

    # determinism on the driver corpus: identical scores across runs
    sf = "/root/testdata/sf0.001"
    a = sorted((r.doc_id, r.lr_score_ppm)
               for r in C.quality_classifier(spark, sf).collect())
    b = sorted((r.doc_id, r.lr_score_ppm)
               for r in C.quality_classifier(spark, sf).collect())
    assert a == b


def test_tokenizer_fertility_composes_the_three_encode_paths(spark):
    """The fertility grid must be EXACTLY the corpus rollup of the
    three registered per-doc encode queries — same trainers, same
    session caches, one row per system with exact-integer ppm
    ratios."""
    from maillog2db_spark.operators import text as tx

    got = {r.system: r for r in tx.tokenizer_fertility(spark, SF).collect()}
    assert set(got) == {"bpe", "unigram", "wordpiece"}

    bpe = tx.bpe_encode_stats(spark, SF).collect()
    uni = tx.unigram_encode_stats(spark, SF).collect()
    wp = tx.wordpiece_encode_stats(spark, SF).collect()
    for system, rows, units in (
        ("bpe", bpe, "n_bpe_symbols"),
        ("unigram", uni, "n_pieces"),
        ("wordpiece", wp, "n_wp_symbols"),
    ):
        n_words = sum(r.n_tokens for r in rows)
        n_units = sum(getattr(r, units) for r in rows)
        g = got[system]
        assert (g.n_docs, g.n_words, g.n_units) == (len(rows), n_words, n_units)
        assert g.fertility_ppm == n_units * 1_000_000 // n_words
        assert g.compression_ppm == n_words * 1_000_000 // n_units
        # subword tokenizers split words: fertility >= 1 word/unit side
        assert g.fertility_ppm >= 1_000_000


def test_mink_prob_flags_memorized_boilerplate(spark, tmp_path):
    """Planted membership signal: a template repeated across many docs
    keeps a LOW tail NLL (even its least-likely bigrams are corpus-
    frequent), a novel doc over unique tokens scores a HIGH tail —
    the separation the all-token average cannot show as cleanly. Also
    pins the exact tail-size contract: n_tail == ceil(n_bigrams·k/100)."""
    from maillog2db_spark.operators import corpus_analytics as ca

    template = " ".join(f"common{i % 7}" for i in range(40))
    rows = [(i, "en", "s0", template, len(template)) for i in range(10)]
    novel = " ".join(f"rare{i}" for i in range(40))
    rows.append((10, "en", "s0", novel, len(novel)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string, n_chars int"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: r for r in ca.mink_prob(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(11))
    for r in got.values():
        assert r.n_tail == (r.n_bigrams * ca.MINK_PCT + 99) // 100
    memorized = max(got[i].mink_avg_nll_ppm for i in range(10))
    assert memorized < got[10].mink_avg_nll_ppm
