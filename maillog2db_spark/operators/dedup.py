"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface: exact, MinHash+LSH, SimHash, and
blocked n-gram Jaccard near-dup detection.

All hashing is md5-based (hex strings order-compare identically in
Spark and DuckDB), so every stage — shingling, signatures, banding,
candidate pairs, verification — is SQL-expressible and oracle-checked.

Scale design (100 TB):
  * Exact dedup: hash-groupBy on a fingerprint — one shuffle, no
    full-row comparisons.
  * MinHash/LSH: per-doc signature is a single explode + groupBy
    (map-side combined); candidate generation joins on (band,
    band_hash) buckets — the join key IS the blocking key, so the
    self-join never goes quadratic. Verification runs only on
    candidates.
  * Blocked Jaccard: quadratic only within a (lang) block — at real
    scale the block key would be (lang, length-bucket, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io

N_HASHES = 8
N_BANDS = 4  # rows-per-band = 2
SHINGLE_W = 3
JACCARD_THRESHOLD = 0.7

# tokens: lowercase, whitespace-split, empties removed (identical
# semantics spelled in both engines)
_TOKENS_SPARK = "filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')"
_TOKENS_DUCK = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"

# 3-word shingles, deduplicated. The Spark variant is built FROM a
# materialized tokens column (see _with_shingles) so the split() runs
# once per row, not once per textual reference.
_SHINGLES_FROM_TOKS_SPARK = (
    f"array_distinct(CASE WHEN size(toks) >= {SHINGLE_W} THEN "
    f"transform(sequence(1, size(toks) - {SHINGLE_W - 1}), "
    f"i -> array_join(slice(toks, i, {SHINGLE_W}), ' ')) "
    "ELSE array() END)"
)
_SHINGLES_DUCK = (
    f"list_distinct(list_transform(generate_series(1, len({_TOKENS_DUCK}) - {SHINGLE_W - 1}), "
    f"i -> array_to_string(list_slice({_TOKENS_DUCK}, i, i + {SHINGLE_W - 1}), ' ')))"
)


def _with_shingles(
    spark: SparkSession, sf_dir: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """documents → (doc_id, *extra_cols, sh): distinct 3-word shingle
    arrays, with any passthrough columns carried in the SAME scan (a
    separate scan + re-join on doc_id would be a whole extra pass over
    the corpus).

    Repartitions on doc_id before shingling: higher-order functions
    (transform/filter lambdas) are CodegenFallback — interpreted, CPU
    heavy — and a small parquet file scans as ONE partition, so without
    the exchange the whole shingle computation runs on a single core
    (measured 8.6s → 0.4s at sf0.1 on local[32]). At 100 TB the scan is
    already wide and AQE coalesces this exchange to a no-op-sized
    shuffle; the partitioning also pre-aligns the doc_id joins the
    near-dup verifiers do downstream."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    return d.select("doc_id", *extra_cols, F.expr(_TOKENS_SPARK).alias("toks")).select(
        "doc_id", *extra_cols, F.expr(_SHINGLES_FROM_TOKS_SPARK).alias("sh")
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: one representative (min
    doc_id) per md5(text), with duplicate counts."""
    d = io.load(spark, sf_dir, "documents")
    return (
        d.withColumn("fingerprint", F.md5(F.encode(F.col("text"), "UTF-8")))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS fingerprint,
       min(doc_id) AS rep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature via Carter-Wegman double hashing
    (Broder's scheme as commonly deployed): ONE md5 per shingle split
    into two 32-bit halves (h1, h2), then mh_i = min(h1 + i*h2),
    i = 0..N_HASHES-1. Max value < 2^40, so the arithmetic never
    overflows (both engines run ANSI overflow-checked bigints), and the
    per-shingle hashing cost is constant in N_HASHES — the difference
    between 1 and N_HASHES md5 evaluations per shingle across 100 TB."""
    # no size()>0 pre-filter: explode of an empty array yields no rows
    # anyway, and a pushed-down filter would re-inline (= recompute) the
    # whole shingle expression below the projection
    sh = _with_shingles(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    h = sh.select(
        "doc_id",
        F.md5(F.encode(F.col("s"), "UTF-8")).alias("hx"),
    ).select(
        "doc_id",
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring("hx", 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}") for i in range(N_HASHES)
    ]
    return h.groupBy("doc_id").agg(*aggs)


_SIG_DUCK_CTE = f"""
shingled AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s
  FROM documents WHERE len({_SHINGLES_DUCK}) > 0
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(s), 9, 8))::BIGINT AS h2
  FROM shingled
),
sigs AS (
  SELECT doc_id,
         {", ".join(f"min(h1 + {i} * h2) AS mh{i}" for i in range(N_HASHES))}
  FROM hashed GROUP BY doc_id
)"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir)


MINHASH_SIGNATURES_SQL = f"WITH {_SIG_DUCK_CTE}\nSELECT * FROM sigs"


def _pairs_within_groups(keyed: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group, doc_id) → all (doc_a < doc_b) pairs co-occurring in any
    group, deduplicated. One aggregation + per-group combination
    expansion instead of a self-join — the upstream (often expensive)
    plan is computed ONCE, and there is no join at all.

    Memory shape: the expansion is TWO chained explodes, so no single
    row ever holds the k² pair set — after the first (pos)explode each
    row carries one anchor element plus the bucket's id array (O(k)),
    and the second explode streams its suffix. A bucket of k exact
    duplicates (the guaranteed hot case in a dedup corpus) therefore
    costs O(k) per row / O(k²) total streamed rows — the same output
    volume a self-join would shuffle, without a single 2 GB array value
    (an earlier single-row flatten(transform(...)) materialized all
    pairs inside one value; caught in review)."""
    grouped = keyed.groupBy(*group_cols).agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    anchored = grouped.filter(F.size("ids") > 1).select(
        "ids", F.posexplode("ids").alias("i", "doc_a")
    )
    pairs = anchored.select(
        "doc_a",
        F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias("doc_b"),
    )
    return pairs.distinct()


def _band_pairs(sigs: DataFrame) -> DataFrame:
    """LSH banding: bucket docs by each band's (mh pair) value →
    candidate pairs co-occurring in any bucket. The band value itself is
    the bucket key — no extra hashing needed."""
    # all bands in ONE pass over sigs (a union of per-band selects would
    # re-plan — and recompute — the signature aggregation per branch)
    band_array = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", f"mh{2*b}", f"mh{2*b+1}").alias("bh"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_array).alias("bb")).select(
        "doc_id", "bb.band", "bb.bh"
    )
    return _pairs_within_groups(banded, ["band", "bh"])


_BANDS_DUCK_CTE = (
    "banded AS (\n"
    + "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, mh{2*b} || '|' || mh{2*b+1} AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    + "\n),\ncand AS (\n"
    "  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b\n"
    "  FROM banded l JOIN banded r ON l.band = r.band AND l.bh = r.bh\n"
    "  WHERE l.doc_id < r.doc_id\n)"
)


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _band_pairs(_signatures(spark, sf_dir))


LSH_CANDIDATE_PAIRS_SQL = f"WITH {_SIG_DUCK_CTE},\n{_BANDS_DUCK_CTE}\nSELECT * FROM cand"


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup: candidates from banding, verified with
    true shingle-Jaccard ≥ threshold. Verification joins shingle sets
    only for candidate pairs — never quadratic."""
    d = _with_shingles(spark, sf_dir)
    cand = lsh_candidate_pairs(spark, sf_dir)
    a = d.alias("a")
    b = d.alias("b")
    j = (
        cand.join(a, cand.doc_a == F.col("a.doc_id"))
        .join(b, cand.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_distinct(F.concat("a.sh", "b.sh")))
            ).alias("jaccard"),
        )
    )
    # jaccard is an exact rational — emit as ppm integer (floor-half-up),
    # since float round() differs across engines at exact .5 boundaries
    return j.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a",
        "doc_b",
        F.floor(F.col("jaccard") * 1_000_000 + 0.5).cast("bigint").alias("jaccard_ppm"),
    )


NEARDUP_PAIRS_SQL = f"""WITH {_SIG_DUCK_CTE},
{_BANDS_DUCK_CTE},
sh AS (SELECT doc_id, {_SHINGLES_DUCK} AS sh FROM documents)
SELECT doc_a, doc_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jaccard_ppm FROM (
  SELECT doc_a, doc_b,
         len(list_intersect(a.sh, b.sh))::DOUBLE
           / len(list_distinct(list_concat(a.sh, b.sh))) AS j
  FROM cand JOIN sh a ON cand.doc_a = a.doc_id
            JOIN sh b ON cand.doc_b = b.doc_id
) WHERE j >= {JACCARD_THRESHOLD}
"""


BLOCKED_JACCARD_T = 0.8


def blocked_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word-shingle) Jaccard similarity join within
    (lang) blocks, Jaccard ≥ 0.8 — implemented with AllPairs-style
    PREFIX FILTERING (Bayardo et al., WWW'07): sort each shingle set
    under a global order; two sets with J ≥ t MUST share an element in
    their first ⌊(1-t)·n⌋+1 shingles, so candidates come from an
    inverted index over prefixes only. Exact (no qualifying pair is
    lost), and the candidate join is sparse — never the quadratic
    block cross-product (the DuckDB oracle runs the naive quadratic as
    the independent check)."""
    d = _with_shingles(spark, sf_dir, extra_cols=("lang",))
    # no size()>0 filter: empty sets produce an empty prefix (no index
    # entries → never a candidate), and dropping it avoids Catalyst
    # re-inlining the shingle expression under a pushed-down predicate
    d = (
        d.withColumn("sh", F.array_sort("sh"))
        .withColumn("n", F.size("sh"))
        .withColumn(
            "prefix",
            F.slice(
                "sh", 1, (F.floor(F.col("n") * (1 - BLOCKED_JACCARD_T)) + 1).cast("int")
            ),
        )
    )
    idx = d.select("doc_id", "lang", F.explode("prefix").alias("p"))
    cand = _pairs_within_groups(idx, ["lang", "p"])
    sets = d.select("doc_id", "lang", "sh")
    a = sets.alias("a")
    b = sets.alias("b")
    j = (
        cand.join(a, cand.doc_a == F.col("a.doc_id"))
        .join(b, cand.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("a.lang").alias("lang"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_distinct(F.concat("a.sh", "b.sh")))
            ).alias("j"),
        )
    )
    return j.filter(F.col("j") >= BLOCKED_JACCARD_T).select(
        "doc_a",
        "doc_b",
        "lang",
        F.floor(F.col("j") * 1_000_000 + 0.5).cast("bigint").alias("jaccard_ppm"),
    )


BLOCKED_JACCARD_PAIRS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {_SHINGLES_DUCK} AS sh FROM documents
  WHERE len({_SHINGLES_DUCK}) > 0
)
SELECT doc_a, doc_b, lang, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jaccard_ppm FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
         len(list_intersect(a.sh, b.sh))::DOUBLE
           / len(list_distinct(list_concat(a.sh, b.sh))) AS j
  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
) WHERE j >= {BLOCKED_JACCARD_T}
"""


# --- near-dup clusters (connected components) -------------------------------


def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified
    near-dup pair graph via iterative min-label propagation — the step a
    real dedup pipeline runs after pair generation (keep one doc per
    component). Genuinely iterative (not SQL-expressible without
    recursive aggregation), so this query has no DuckDB oracle and takes
    the driver's rows-only check.

    Scale: near-dup components are tiny (pairs are ≥ threshold similar),
    so the propagation converges in O(log(diameter)) rounds — each round
    is one groupBy over the edge list. The loop is DRIVER-side control
    flow only; all data stays distributed. Convergence is checked with a
    cheap changed-count aggregate; localCheckpoint truncates the
    growing lineage each round (the standard iterative-algorithm
    pattern on Spark)."""
    pairs = neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # undirected edges (both directions); no self-loops needed — the
    # least(own, neighbor-min) in the propagation step covers the
    # keep-own-label case
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    while True:
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
                (F.col("ncomp") < F.col("comp")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return (
        labels.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.array_sort(F.collect_list("doc_id")).alias("members"),
        )
        .select(F.col("comp").alias("cluster_id"), "n_docs", "keep_doc_id", "members")
    )


# --- SimHash ---------------------------------------------------------------
#
# 32-bit simhash built from the first 8 hex chars of each token's md5
# (4 bits per hex char via strpos arithmetic — no hex→int builtin is
# needed, keeping both engines identical).

_HEX = "0123456789abcdef"


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, token) with the token's 32-bit hash as an
    integer (conv hex→long), then ALL 32 bit-votes as columnar
    aggregates in a single groupBy(doc_id) — no 32× row explosion, no
    second shuffle. At 100 TB this is one map-side-combined exchange on
    doc_id over the token stream; the 32 sums vectorize in codegen.

    Bit mapping matches the oracle's nibble arithmetic: hex char j holds
    bits 4j..4j+3 with bit = (nibble >> (b%4)) & 1, and conv() parses
    char 0 as the HIGH nibble, so bit b lives at integer position
    28 - 4*(b div 4) + (b % 4)."""
    d = io.load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_TOKENS_SPARK))).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.encode("tok", "UTF-8")), 1, 8), 16, 10)
        .cast("long")
        .alias("v"),
    )
    votes = [
        F.sum(
            F.shiftright(F.col("v"), 28 - 4 * (b // 4) + b % 4)
            .bitwiseAND(F.lit(1))
            * 2
            - 1
        ).alias(f"vote{b}")
        for b in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(32):
        sig = sig + F.when(
            F.col(f"vote{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", sig.alias("simhash"))


SIMHASH_SIGNATURES_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_DUCK})) AS tok FROM documents
), hashed AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), bits AS (
  SELECT doc_id, r.range AS bit,
         ((strpos('{_HEX}', substr(h, CAST(r.range // 4 AS INT) + 1, 1)) - 1)
          >> CAST(r.range % 4 AS INT)) & 1 AS b
  FROM hashed CROSS JOIN range(32) r
), votes AS (
  SELECT doc_id, bit, sum(b * 2 - 1) AS vote FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


SIMHASH_HD_MAX = 3
_SIMHASH_BANDS = 4  # 4 bands × 8 bits; pigeonhole: hd ≤ 3 ⇒ ≥1 band equal


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ 3.

    Candidate generation is banded (4×8-bit bands of the 32-bit
    signature): pairs join only inside equal (band_id, band_value)
    buckets — a plain equi-shuffle, never an all-pairs product — and by
    pigeonhole the recall at hd ≤ 3 is EXACT, not approximate. At 100 TB
    the knob is band count/width (k bands of w bits gives exact recall
    for hd < k over a k·w-bit signature); occupancy per bucket stays
    bounded because a band value is 8 uniform bits per ~256 docs.
    """
    # lazy localCheckpoint: the self-join below otherwise recomputes the
    # whole signature aggregation on BOTH sides (measured 3x at sf0.1).
    # In-bucket pair expansion (_pairs_within_groups) would avoid the
    # join entirely but serializes each bucket into one task — the heavy
    # near-dup clusters in this corpus make that a straggler (measured
    # slower); the equi-join keeps hot buckets parallel.
    sigs = simhash_signatures(spark, sf_dir).localCheckpoint(eager=False)
    band = F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1))).alias("band_id")
    bands = sigs.select("doc_id", "simhash", band).withColumn(
        "band_val", F.expr("shiftright(simhash, CAST(8 * band_id AS INT)) & 255")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sig_a"),
        "band_id", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sig_b"),
        F.col("band_id").alias("band_id_b"), F.col("band_val").alias("band_val_b"),
    )
    hd = F.bit_count(F.expr("sig_a ^ sig_b"))
    return (
        a.join(
            b,
            (a.band_id == b.band_id_b)
            & (a.band_val == b.band_val_b)
            & (a.doc_id_a < b.doc_id_b),
        )
        # Hamming filter BEFORE the pair-dedup: hd depends only on the
        # pair, so filter∘distinct ≡ distinct∘filter — but filtering
        # first means the distinct's shuffle carries only the (sparse)
        # near-dup rows, not every banded collision with both 64-bit
        # signatures (measured ~10% at sf0.1; the gap widens with band
        # collision rate, i.e. with corpus size)
        .filter(hd <= SIMHASH_HD_MAX)
        .select("doc_id_a", "doc_id_b", hd.alias("hamming_distance"))
        .distinct()  # a pair may share several bands
    )


SIMHASH_NEARDUP_PAIRS_SQL = f"""
WITH sigs AS ({SIMHASH_SIGNATURES_SQL}),
bands AS (
  SELECT doc_id, simhash, r.range AS band_id,
         (simhash >> CAST(8 * r.range AS INT)) & 255 AS band_val
  FROM sigs CROSS JOIN range({_SIMHASH_BANDS}) r
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                  a.simhash AS sig_a, b.simhash AS sig_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b,
       bit_count(xor(sig_a, sig_b)) AS hamming_distance
FROM cands WHERE bit_count(xor(sig_a, sig_b)) <= {SIMHASH_HD_MAX}
"""
