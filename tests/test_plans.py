"""Plan-hygiene regression tests: the physical plans we ship are part
of the product at 100 TB. Catches silent regressions in pushdown,
pruning, join strategy, and accidental cross-products across ALL
registered queries."""

from __future__ import annotations

import re

import pytest

from maillog2db_spark import queries as Q

SF = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains a BroadcastNestedLoopJoin,
# each mapped to the marker(s) its broadcast BUILD SIDE must contain —
# either a zero-key (1-row) scalar aggregate, or a constant-bounded
# broadcast (query-head filter / label-cardinality centroids). The
# per-query marker stops a future REAL cross product from hiding
# behind a blanket allowlist: every IdentityBroadcastMode exchange in
# the plan must match one of the query's markers.
_SCALAR = "HashAggregate(keys=[]"  # zero grouping keys → exactly 1 row
BNL_ALLOWED = {
    # N_QUERIES-head broadcast (vec_id < 25 filter) scored vs corpus;
    # "cent_nrm" is the session-cached k-row centroid table, whose
    # InMemoryTableScan renders by its columns once another test/query
    # has warmed the cache (order-dependent plan text, same tiny side)
    "embed_knn_bruteforce": [_SCALAR, "vec_id", "cent_nrm"],
    "embed_hard_negatives": ["vec_id", "cent_nrm"],
    # pool rides cosine_topk's N_QUERIES-head broadcast; the greedy
    # steps run over bounded checkpointed frames
    "embed_mmr_rerank": [_SCALAR, "vec_id", "cent_nrm"],
    "embed_ann_ivf_topk": [_SCALAR, "vec_id", "label", "cent_nrm"],
    "embed_semdedup": [_SCALAR, "label", "cent_nrm"],
    # N_QUERIES-head signature/query broadcasts (Hamming scan + rerank)
    "embed_hamming_topk": [_SCALAR, "vec_id", "cent_nrm"],
    "embed_hamming_recall": [_SCALAR, "vec_id", "cent_nrm"],
    "embed_kmeans": [_SCALAR, "label", "cent_nrm"],
    "embed_ann_recall": [_SCALAR, "vec_id", "label", "cent_nrm"],
    "embed_ivfpq_topk": [_SCALAR, "vec_id", "label", "cent_nrm"],
    "embed_truncation_recall": [_SCALAR, "vec_id", "cent_nrm"],
    # same N_QUERIES-head broadcast, over the checkpointed
    # reconstructed-embedding scan (renders as ExistingRDD)
    "embed_int8_recall": [_SCALAR, "vec_id", "cent_nrm", "Scan ExistingRDD"],
    # eval grid: BM25's 1-row stats cross, the N_QUERIES-head cosine
    # broadcast, and the (≤N_QUERIES)-row query-id grid crossed with
    # the constant 3-row system table — every build side bounded
    "doc_retrieval_label_eval": [_SCALAR, "vec_id", "cent_nrm"],
    # 1-row scalar aggregates broadcast back over the big side
    "doc_tfidf_topk": [_SCALAR],
    "tpch_q11_important_parts": [_SCALAR],
    "tpch_q22_dormant_customers": [_SCALAR],
    "doc_unigram_lm_score": [_SCALAR],
    "doc_ccnet_buckets": [_SCALAR],  # composes the KN score (1-row ttypes)
    "doc_kn_perplexity": [_SCALAR],  # 1-row bigram-type-total broadcast
    "doc_kn3_perplexity": [_SCALAR],  # same 1-row ttypes broadcast
    "doc_kn_heldout": [_SCALAR],  # same 1-row ttypes broadcast
    "doc_kn4_perplexity": [_SCALAR],  # same 1-row ttypes broadcast
    "doc_kn5_perplexity": [_SCALAR],  # same 1-row ttypes broadcast
    "doc_kn5_heldout": [_SCALAR],  # same 1-row ttypes broadcast
    "doc_lsh_recall": [_SCALAR],  # two 1-row count aggregates cross
    "doc_doremi_weights": [_SCALAR],  # vocab-total / ref / Σw 1-row sides
    "doc_bigram_lm_score": [_SCALAR],
    "doc_mink_prob": [_SCALAR],  # same 1-row vocab-total broadcast
    "li_part_pagerank": [_SCALAR],
    "ord_abc_pareto": [_SCALAR],
    # (doc_bpe_* left the list in round 5: the winning pair is now a
    # collected literal, so the trainer has no broadcast join at all)
    "li_basket_affinity": [_SCALAR],
    "li_basket_rules": [_SCALAR],
    "doc_corpus_pipeline": [_SCALAR],
    "ord_rfm_segments": [_SCALAR],  # 1-row customer-count broadcast
    # 1-row corpus-total broadcast + constant 20-row bin-grid Range
    "dq_length_drift_psi": [_SCALAR, "Range (0, 20"],
    # 1-row (n_docs, avgdl) corpus-stats broadcast
    "doc_bm25_topk": [_SCALAR],
    # inherits bm25's 1-row stats broadcast + knn's N_QUERIES-head side
    "doc_hybrid_rrf_topk": [_SCALAR, "vec_id", "cent_nrm"],
    # 1-row max-doc-id broadcast (bucket-grid boundary)
    "doc_vocab_growth": [_SCALAR],
    # constant-bounded top-M head-vocabulary broadcast (KL support grid)
    "doc_source_kl": [_SCALAR, "TakeOrderedAndProject(limit=200"],
    # 1-row (n_total, sqrt_total) policy-normalizer broadcast
    "doc_source_temperature_mix": [_SCALAR],
    # (doc_dsir_weights left the list in round 5: the model totals are
    # now exact bigint literals inlined at plan time — no BNL remains)
    # k-row final-centroid broadcast (same tiny side as embed_kmeans)
    "embed_silhouette": [_SCALAR, "label", "cluster", "cent_nrm"],
    # 1-row total-count broadcast feeding ntile_from_rank
    "ord_price_equidepth": [_SCALAR],
    # inherits embed_semdedup's centroid/threshold tiny sides
    "embed_semdedup_keep_best": [_SCALAR, "label", "cent_nrm"],
    # 1-row corpus-count broadcast (per-epoch position = rank - epoch*n)
    "doc_epoch_shuffle": [_SCALAR],
    # (embed_kcenter_coreset needs no entry: the recount formulation
    # has no broadcast-nested-loop side at all — centers are literals)
    # 1-row whole-vocab context-stats broadcast joined to the 1-row fit
    "doc_zipf_fit": [_SCALAR],
    # 1-row daily-mean broadcast over the bounded day grid
    "ev_changepoint_cusum": [_SCALAR],
    # calendar-bounded month-spine broadcast (explode of the 1-row span)
    "li_part_croston": [_SCALAR],
}


def _plan(spark, name: str) -> str:
    return Q.REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def _tree_depth(line: str) -> int:
    """Nesting depth of a plan line = length of its marker prefix
    (space / ':' / '+' / '-' runs grow by 3 per level)."""
    return len(re.match(r"^[\s:+\-]*", line).group(0))


def _subtrees(plan: str, needle: str) -> list[str]:
    """Each subtree rooted at a line containing ``needle``."""
    lines = plan.splitlines()
    out = []
    for i, l in enumerate(lines):
        if needle in l:
            d = _tree_depth(l)
            j = i + 1
            while j < len(lines) and _tree_depth(lines[j]) > d:
                j += 1
            out.append("\n".join(lines[i:j]))
    return out


def test_no_cartesian_products_anywhere(spark):
    offenders = []
    for name in Q.REGISTRY:
        p = _plan(spark, name)
        if "CartesianProduct" in p:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in p:
            if name not in BNL_ALLOWED:
                offenders.append((name, "BroadcastNestedLoopJoin"))
            else:
                # BNL broadcast sides always use IdentityBroadcastMode
                # (hash joins use HashedRelationBroadcastMode): every
                # such exchange must be the query's justified tiny side
                for sub in _subtrees(p, "BroadcastExchange IdentityBroadcastMode"):
                    if not any(m in sub for m in BNL_ALLOWED[name]):
                        offenders.append((name, "unjustified BNL build side"))
    assert offenders == []


# Unpartitioned ORDERED windows run as ONE task sorting the whole
# input — allowed only where the input is bounded by construction,
# never data-proportional (those go through
# windows.distributed_cumulative).
UNPARTITIONED_WINDOW_ALLOWED = {
    "doc_cms_heavy_hitters",  # runs post-limit(CMS_TOP_K): ≤ K rows
    "ord_revenue_ewma",  # RANGE frame over calendar days: ≤ date span
    "doc_vocab_growth",  # cumsum over the bucket grid: ≤ VOCAB_BUCKETS rows
    "ord_seasonal_index",  # RANGE frames over calendar months: ≤ date span
    "doc_zipf_fit",  # rank window runs post-limit: ≤ ZIPF_TOP_RANKS rows
    "ev_changepoint_cusum",  # cumsum/prefix-min over the day grid: ≤ date span
}


def test_no_unpartitioned_window_over_data_proportional_input(spark):
    """Generalizes the round-4 pin: across ALL registered queries, any
    ``Window`` with an ORDER BY but no PARTITION BY (the
    `WindowExec: No Partition Defined` single-task shape) must be on
    the bounded-input allowlist. A Window plan line renders as
    `Window [exprs], [partitionCols], [orderCols]`; with no partition
    spec only two bracket groups remain and the last carries the
    ASC/DESC order — partition-only specs (no ORDER BY) also have two
    groups but no sort direction, and are fine (hash-partitioned)."""
    offenders = []
    for name in Q.REGISTRY:
        p = _plan(spark, name)
        for l in p.splitlines():
            ls = l.strip()
            if not re.match(r"^[\s:+\-]*(\*\(\d+\) )?Window ", l):
                continue
            groups = ls.split("], [")
            if len(groups) == 2 and re.search(r"(ASC|DESC)", groups[-1]):
                if name not in UNPARTITIONED_WINDOW_ALLOWED:
                    offenders.append((name, ls[:120]))
    assert offenders == []


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(spark, "tpch_q3_shipping_priority")
    # the mktsegment predicate must reach the customer parquet scan
    scan = next(
        l for l in p.splitlines() if "FileScan parquet" in l and "c_mktsegment" in l
    )
    assert "= BUILDING" in scan  # filter present at the scan, not above it


def test_column_pruning_reaches_scan(spark):
    p = _plan(spark, "tpch_q1_pricing_summary")
    # lineitem has 16 columns; the scan must read only the 7 Q1 needs
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "l_comment" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan


def test_flagship_join_broadcasts_the_dimension(spark):
    p = _plan(spark, "ml_msg_delivery_join")
    assert "BroadcastHashJoin" in p


def test_dedup_candidates_bounded_no_sig_self_join(spark):
    # candidate generation is groupBy + BOUNDED in-bucket expansion.
    # On a corpus with no oversize buckets (this one — the adaptive
    # probe verified it) the plan is JOIN-FREE: one aggregation plus
    # chained explodes, never the signature aggregation subtree joined
    # against itself (that would recompute the md5-per-shingle work per
    # side) and never a cartesian. The oversize path's single salted
    # join is pinned by test_hot_bucket_pairs_bounded_row_width.
    p = _plan(spark, "doc_lsh_candidate_pairs")
    assert p.count("Join") == 0, p
    assert "CartesianProduct" not in p
    # the signature subtree is served from the session cache, not
    # recomputed inline per branch
    assert "InMemoryTableScan" in p


def test_queries_self_configure_session(spark):
    """The driver runs queries() in ITS session without calling entry();
    every query must self-apply the conf its correctness depends on
    (UTC timezone for epoch-window hashing) at the io.load chokepoint."""
    import random

    sample = ["ev_tumbling_hourly", "tpch_q1_pricing_summary", "doc_exact_dedup",
              "embed_lsh_buckets", "ml_logs", "mm_binary_meta"]
    try:
        # caller-set exclusions must survive the union
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.CallerRule",
        )
        for name in sample:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            Q.REGISTRY[name].fn(spark, SF)
            assert spark.conf.get("spark.sql.session.timeZone") == "UTC", name
        assert "CallerRule" in spark.conf.get("spark.sql.optimizer.excludedRules")
        assert "InferFiltersFromGenerate" in spark.conf.get("spark.sql.optimizer.excludedRules")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from maillog2db_spark.session import EXCLUDED_OPTIMIZER_RULES

        spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)


def test_disjunctive_predicates_stay_one_join(spark):
    # q19's OR-of-conjunctions shares one equi-key (partkey); the plan
    # must be a single hash join with a post-join filter, NOT a union
    # of three scans (which would read lineitem three times at 100 TB)
    p = _plan(spark, "tpch_q19_disjunctive_revenue")
    assert p.count("Join") == 1, p
    assert "Union" not in p


def test_exists_becomes_semi_join(spark):
    # q4's EXISTS must stay a LeftSemi (no duplicate inflation + dedup)
    p = _plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in p


def test_not_exists_becomes_anti_join(spark):
    # q22's NOT EXISTS must stay a LeftAnti
    p = _plan(spark, "tpch_q22_dormant_customers")
    assert "LeftAnti" in p


def test_q21_fact_table_shuffles_once(spark):
    # the EXISTS/NOT EXISTS self-correlation is decorrelated into
    # per-orderkey aggregates over a lazily-checkpointed subtree — the
    # lineitem⋈orders join must appear once, not once per correlate
    p = _plan(spark, "tpch_q21_waiting_suppliers")
    assert p.count("Scan ExistingRDD") <= 2  # checkpointed subtree reused
    assert "CartesianProduct" not in p


def test_json_parse_is_single_pass(spark):
    # from_json with explicit schema parses once per row; a plan with
    # one JsonToStructs per extracted field means get_json_object crept in
    p = _plan(spark, "ev_props_json_stats")
    assert p.count("from_json") <= 1, p


def test_asof_join_is_single_exchange(spark):
    # union + ordered window — the whole as-of join must cost exactly
    # one shuffle (the window's partitionBy); a second exchange means a
    # redundant pre-aggregation crept back in
    p = _plan(spark, "ev_asof_purchase_click")
    assert p.count("Exchange") == 1, p


def test_round3_queries_prune_columns(spark):
    """New round-3 queries read only the columns they need: the LM
    score scans (doc_id, text), RFM scans (custkey, orderdate,
    totalprice) — never the full row."""
    p = _plan(spark, "doc_unigram_lm_score")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l and "documents" in l)
    assert "text" in scan and "source" not in scan and "n_chars" not in scan

    # rfm's orders scan now sits inside the checkpointed two-phase
    # subtree (not visible in the final plan), so pin the same
    # (custkey, orderdate, totalprice) pruning on cohort LTV instead
    p = _plan(spark, "ord_cohort_ltv")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l and "orders" in l)
    assert "o_totalprice" in scan and "o_orderpriority" not in scan and "o_orderstatus" not in scan


def test_round4_session_query_plan_shapes(spark):
    """Plan pins for the round-4-late operators: the IVFPQ scoring join
    broadcasts the lookup table; the edit-distance candidate join is a
    band-keyed equi-join (hash/merge, never nested-loop); attribution
    rides the range join's cell-decomposed equi-shuffle; the Pareto
    walk windows over the POST-AGGREGATE table (one HashAggregate
    below the window)."""
    p = _plan(spark, "embed_ivfpq_topk")
    assert "BroadcastHashJoin" in p
    for name in ("doc_edit_distance_pairs", "ev_multitouch_attribution",
                 "ord_cohort_ltv"):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, name
        assert "HashJoin" in p or "SortMergeJoin" in p, name
    # the whole islands collapse (flag, cumsum, aggregate) rides ONE
    # custkey shuffle — a second Exchange means the window partitioning
    # stopped feeding the aggregate
    p = _plan(spark, "ord_priority_islands")
    assert "Join" not in p
    assert p.count("Exchange") == 1, p
    # pagerank's only BNL is the 1-row node-count broadcast; the
    # edge×rank joins themselves must be equi-joins
    p = _plan(spark, "li_part_pagerank")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    # the Pareto walk / RFM quartiles / sweep-line depth ride the
    # two-phase distributed cumsum: the local phase is materialized
    # (ExistingRDD scan) and no Window survives into the final plan at
    # all (it runs partitioned inside the checkpointed subtree). At
    # this SF the size-adaptive width picks ONE range partition, so
    # the offsets join is skipped outright; the multi-range
    # broadcast-offset shape is pinned separately below.
    for name in ("ord_abc_pareto", "ord_rfm_segments", "ev_concurrent_sessions"):
        p = _plan(spark, name)
        assert "Scan ExistingRDD" in p, name
        assert "Window" not in p, name
    # multi-range path: offsets MUST come back as a broadcast HASH
    # join on _pid (a sort-merge would re-shuffle the whole local
    # phase to add ≤ n_parts scalars)
    from pyspark.sql import functions as F

    from maillog2db_spark.operators.windows import distributed_cumulative

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("v")
    )
    phys = (
        distributed_cumulative(
            df, [F.col("v"), F.col("id")], sum_cols=("v",), n_parts=7
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in phys, phys[:800]
    assert "BroadcastHashJoin" in phys, phys[:800]
