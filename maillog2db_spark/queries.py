"""Query registry: every operator from SURVEY.md §2 as a (Spark
callable, DuckDB oracle SQL) pair.

Each Spark callable takes (spark, sf_dir) and returns a DataFrame whose
column names match the oracle exactly (the driver sorts columns by name
before value-hashing). Queries whose semantics are not SQL-expressible
have oracle=None → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io, oracle, parsing, synth, tables

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle_sql: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle_sql: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(fn=fn, oracle_sql=oracle_sql, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return io.load(spark, sf_dir, table)


# Session-scoped materialized parse layer. Eight ml_* queries share the
# same synthesize→parse subtree; persisting it once per (session,
# sf_dir) is the query-side analogue of the canonical parsed table the
# ingest path materializes — at 100 TB you parse once and query many
# times, never re-regex the raw log per query. WeakKeyDictionary ties
# cache lifetime to the session (a stopped session's blocks are gone;
# its entry must not shadow a new session's).
_PARSE_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session conf is action-time state, not plan-time — a cache hit must
    # still re-apply it (timezone decides what the timestamps hash to)
    io.ensure_session_conf(spark)
    per_session = _PARSE_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        df = parsing.parse_lines(
            synth.lines_df(spark, sf_dir), seq_col="seq", year=synth.SYNTH_YEAR
        ).persist()
        per_session[sf_dir] = df
    return df


# --- maillog core (SURVEY §2.1-2.4: the reference's entire surface) -------


@register("ml_parse_header", oracle.PARSED,
          doc="Admission filter + header extraction + router (P1-P4, maillog2db.go:181-275)")
def ml_parse_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir).select(
        "seq", "ts_raw", "mailhost", "process", "pid", "message", "ts", "entry_type"
    )


@register("ml_router_counts", oracle.ROUTER_COUNTS,
          doc="Content-based router cascade, first-match-wins (P4)")
def ml_router_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir).groupBy("entry_type").agg(F.count(F.lit(1)).alias("n"))


@register("ml_logs", oracle.LOGS,
          doc="Raw-log table: append + exact-dup suppression over 5 cols (A1, maillog2db.go:283-306)")
def ml_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.build_logs(_parsed(spark, sf_dir))


@register("ml_clients", oracle.CLIENTS,
          doc="Client entity tracking with freshness update (A3, maillog2db.go:308-330)")
def ml_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.build_clients(_parsed(spark, sf_dir))


@register("ml_messages", oracle.MESSAGES,
          doc="Per-queueid last-writer-wins merge of 3 event streams (A2/J1, maillog2db.go:332-393)")
def ml_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.build_messages(_parsed(spark, sf_dir))


@register("ml_deliveries", oracle.DELIVERIES,
          doc="Delivery attempts: append + exact-dup suppression over 9 cols (A1, maillog2db.go:395-442)")
def ml_deliveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.build_deliveries(_parsed(spark, sf_dir))


@register("ml_delivery_typed", oracle.DELIVERY_TYPED,
          doc="Derived typed columns over raw strings (SURVEY §1.2)")
def ml_delivery_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.with_delivery_typed_columns(tables.build_deliveries(_parsed(spark, sf_dir)))
    return d.select(
        "delivery_queueid",
        "delivery_timestamp",
        "delivery_delay",
        "delivery_delays",
        "delivery_delay_sec",
        F.size("delivery_delays_arr").alias("delivery_delays_n"),
        F.round(
            F.aggregate("delivery_delays_arr", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("delivery_delays_total"),
    )


@register("ml_relay_latency", oracle.RELAY_LATENCY,
          doc="Per-relay delivery-latency profile over typed delay columns (exact percentiles; approx_percentile is the 100TB swap-in)")
def ml_relay_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.with_delivery_typed_columns(tables.build_deliveries(_parsed(spark, sf_dir)))
    delay = F.col("delivery_delay_sec")
    pct = lambda q, name: F.round(F.expr(f"percentile(delivery_delay_sec, {q})"), 4).alias(name)
    return d.groupBy("delivery_relay").agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.sum(F.when(F.col("delivery_status") == "sent", 1).otherwise(0)).alias("n_sent"),
        F.round(F.avg(delay), 6).alias("mean_delay"),
        pct(0.5, "p50_delay"),
        pct(0.9, "p90_delay"),
        F.round(F.max(delay), 6).alias("max_delay"),
    )


@register("ml_relay_latency_approx", None,
          doc="Scale path of ml_relay_latency: approx_percentile t-digest sketch, partial-aggregated, bounded memory — no SQL oracle (different sketch in DuckDB); accuracy vs exact pinned in tests")
def ml_relay_latency_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import APPROX_PCT_ACCURACY

    d = tables.with_delivery_typed_columns(tables.build_deliveries(_parsed(spark, sf_dir)))
    delay = F.col("delivery_delay_sec")
    pct = lambda q, name: F.round(
        F.expr(f"approx_percentile(delivery_delay_sec, {q}, {APPROX_PCT_ACCURACY})"), 4
    ).alias(name)
    return d.groupBy("delivery_relay").agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.sum(F.when(F.col("delivery_status") == "sent", 1).otherwise(0)).alias("n_sent"),
        F.round(F.avg(delay), 6).alias("mean_delay"),
        pct(0.5, "p50_delay"),
        pct(0.9, "p90_delay"),
        F.round(F.max(delay), 6).alias("max_delay"),
    )


@register("ml_msg_delivery_join", oracle.MSG_DELIVERY_JOIN,
          doc="Flagship: messages ⋈ deliveries on queueid (J2), per-status attempt counts")
def ml_msg_delivery_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy localCheckpoint: the parse subtree feeds BOTH join sides —
    # materialize it once per action instead of twice (measured ~35%
    # off the query; unlike persist() it does not register with the
    # cache manager, so no cross-query plan sharing pollutes later
    # queries' measurements)
    parsed = _parsed(spark, sf_dir).localCheckpoint(eager=False)
    messages = tables.build_messages(parsed).select("message_queueid", "message_from")
    deliveries = tables.build_deliveries(parsed)
    # ~97 distinct queueids at any scale → broadcast the aggregated
    # message dimension; the delivery fact side never shuffles.
    return (
        deliveries.join(
            F.broadcast(messages),
            deliveries.delivery_queueid == messages.message_queueid,
            "inner",
        )
        .groupBy("delivery_status", "message_from")
        .agg(F.count(F.lit(1)).alias("n_attempts"))
    )


@register("ml_pii_scrub", oracle.PII_SCRUB,
          doc="PII scrubbing over log lines: emails/IPv4s counted and redacted (codegen regexp only) — log-as-training-data hygiene")
def ml_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = synth.lines_df(spark, sf_dir)
    email, ipv4 = oracle._EMAIL_RE, oracle._IPV4_RE
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("value"), email, "<EMAIL>"), ipv4, "<IP>"
    )
    return lines.select(
        "seq",
        F.regexp_count("value", F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count("value", F.lit(ipv4)).cast("bigint").alias("n_ips"),
        F.md5(scrubbed).alias("scrub_md5"),
    )


@register("ml_admission_stats", oracle.ADMISSION_STATS,
          doc="Admission filter + timestamp-quarantine accounting (P1/F1: dropped lines counted, parse failures quarantined as NULL — vs the reference's log.Fatal)")
def ml_admission_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = synth.lines_df(spark, sf_dir)
    hdr = parsing.header_re(True)
    v = F.col("value")
    adm = v.rlike(hdr)
    ts = parsing.syslog_timestamp(F.regexp_extract(v, hdr, 1), synth.SYNTH_YEAR)
    one = F.lit(1)
    zero = F.lit(0)
    return lines.agg(
        F.count(one).alias("n_total"),
        F.sum(F.when(adm, one).otherwise(zero)).alias("n_admitted"),
        F.sum(F.when(adm, zero).otherwise(one)).alias("n_dropped"),
        F.sum(F.when(adm & ts.isNull(), one).otherwise(zero)).alias("n_quarantined"),
    )


# --- generic relational operators (SURVEY §2.3/2.4/2.5 Spark surface) ------

from .operators import relational as _rel  # noqa: E402
from .operators import windows as _win  # noqa: E402

register("tpch_q1_pricing_summary", _rel.PRICING_SUMMARY_SQL,
         doc="Grouped multi-aggregate scan (TPC-H Q1 shape)")(_rel.pricing_summary)
register("tpch_q3_shipping_priority", _rel.SHIPPING_PRIORITY_SQL,
         doc="Selective 3-way join + deterministic top-k (TPC-H Q3 shape)")(_rel.shipping_priority)
register("tpch_q5_local_supplier", _rel.LOCAL_SUPPLIER_VOLUME_SQL,
         doc="6-way snowflake join, broadcast dims (TPC-H Q5 shape)")(_rel.local_supplier_volume)
register("top_customers_per_nation", _rel.TOP_CUSTOMERS_PER_NATION_SQL,
         doc="Window top-k per group (row_number ≤ k)")(_rel.top_customers_per_nation)
register("distinct_counts", _rel.DISTINCT_COUNTS_SQL,
         doc="Exact multi-column distinct counting")(_rel.distinct_counts)
register("set_ops_customers", _rel.SET_OPS_CUSTOMERS_SQL,
         doc="EXCEPT set operation")(_rel.set_ops_customers)
register("rollup_sales", _rel.ROLLUP_SALES_SQL,
         doc="ROLLUP + grouping indicators")(_rel.rollup_sales)
register("customers_without_orders", _rel.CUSTOMERS_WITHOUT_ORDERS_SQL,
         doc="Left-anti join (NOT EXISTS) — the reference's dedup predicate as an operator")(_rel.customers_without_orders)
register("pivot_returnflag", _rel.PIVOT_RETURNFLAG_SQL,
         doc="Pivot with explicit value list")(_rel.pivot_returnflag)
register("tpch_q6_forecast_revenue", _rel.FORECAST_REVENUE_SQL,
         doc="Pure pushdown scan + shuffle-free aggregate (TPC-H Q6 shape)")(_rel.forecast_revenue)
register("tpch_q10_returned_items", _rel.RETURNED_ITEM_CUSTOMERS_SQL,
         doc="Returned-item revenue top-k over 4-way join (TPC-H Q10 shape)")(_rel.returned_item_customers)
register("tpch_q14_promo_share", _rel.PROMO_REVENUE_SHARE_SQL,
         doc="Conditional aggregate ratio over broadcast join (TPC-H Q14 shape)")(_rel.promo_revenue_share)
register("tpch_q18_large_orders", _rel.LARGE_VOLUME_CUSTOMERS_SQL,
         doc="HAVING-filtered aggregate broadcast into join (TPC-H Q18 shape)")(_rel.large_volume_customers)
register("tpch_q7_nation_trade", _rel.NATION_TRADE_VOLUME_SQL,
         doc="Directed two-nation trade volume, broadcast nation hops (TPC-H Q7 shape)")(_rel.nation_trade_volume)
register("tpch_q13_order_distribution", _rel.CUSTOMER_ORDER_DISTRIBUTION_SQL,
         doc="Outer-join double aggregation histogram (TPC-H Q13 shape)")(_rel.customer_order_distribution)
register("tpch_q15_top_supplier", _rel.TOP_SUPPLIER_SQL,
         doc="Aggregate joined to its own broadcast max (TPC-H Q15 shape)")(_rel.top_supplier)
register("tpch_q17_small_qty_revenue", _rel.SMALL_QUANTITY_REVENUE_SQL,
         doc="Per-group scalar threshold via self-aggregate join (TPC-H Q17 shape)")(_rel.small_quantity_revenue)
register("cube_orders", _rel.CUBE_ORDERS_SQL,
         doc="CUBE over two dims + grouping indicators")(_rel.cube_orders)
register("price_percentiles", _rel.PRICE_PERCENTILES_SQL,
         doc="Exact interpolated percentiles per group (approx_percentile is the 100TB swap-in)")(_rel.price_percentiles)
register("price_percentiles_approx", None,
         doc="Scale path of price_percentiles: approx_percentile sketch, partial-aggregated — rows-only check; accuracy vs exact pinned in tests")(_rel.price_percentiles_approx)

from .operators import relational_ext as _rex  # noqa: E402

register("tpch_q2_min_cost_supplier", _rex.MIN_COST_SUPPLIER_SQL,
         doc="Correlated min decorrelated into per-part min join (TPC-H Q2 shape)")(_rex.min_cost_supplier)
register("tpch_q4_order_priority", _rex.ORDER_PRIORITY_CHECKING_SQL,
         doc="EXISTS as left-semi join with non-equi predicate (TPC-H Q4 shape)")(_rex.order_priority_checking)
register("tpch_q8_market_share", _rex.NATIONAL_MARKET_SHARE_SQL,
         doc="National market share ratio per year, 7-way broadcast snowflake (TPC-H Q8 shape)")(_rex.national_market_share)
register("tpch_q9_product_profit", _rex.PRODUCT_TYPE_PROFIT_SQL,
         doc="LIKE-filtered profit by nation × year (TPC-H Q9 shape)")(_rex.product_type_profit)
register("tpch_q11_important_parts", _rex.IMPORTANT_PARTS_SQL,
         doc="HAVING vs scalar fraction-of-total on integer cents (TPC-H Q11 shape)")(_rex.important_parts)
register("tpch_q12_priority_shipping", _rex.PRIORITY_SHIPPING_SQL,
         doc="CASE-gated priority counts per lateness bucket (TPC-H Q12 shape)")(_rex.priority_shipping)
register("tpch_q16_supplier_counts", _rex.PARTS_SUPPLIER_COUNTS_SQL,
         doc="NOT IN exclusion + distinct counts over derived partsupp (TPC-H Q16 shape)")(_rex.parts_supplier_counts)
register("tpch_q19_disjunctive_revenue", _rex.DISJUNCTIVE_REVENUE_SQL,
         doc="OR of conjunctive join predicates, single hash join (TPC-H Q19 shape)")(_rex.disjunctive_revenue)
register("tpch_q20_excess_suppliers", _rex.EXCESS_SUPPLIERS_SQL,
         doc="Nested IN-subqueries as a semi-join chain (TPC-H Q20 shape)")(_rex.excess_suppliers)
register("tpch_q21_waiting_suppliers", _rex.WAITING_SUPPLIERS_SQL,
         doc="EXISTS/NOT EXISTS self-correlation via shared per-key aggregates (TPC-H Q21 shape)")(_rex.waiting_suppliers)
register("tpch_q22_dormant_customers", _rex.DORMANT_CUSTOMERS_SQL,
         doc="Scalar-subquery threshold + anti join (TPC-H Q22 shape)")(_rex.dormant_customers)
register("dq_referential_integrity", _rex.REFERENTIAL_INTEGRITY_SQL,
         doc="Foreign-key audit across the star schema: per relationship child/null/orphan counts via left-anti joins (the constraint check Spark tables never enforce)")(_rex.referential_integrity)
register("dq_daily_reconciliation", _rex.DAILY_RECONCILIATION_SQL,
         doc="FULL OUTER day-level reconciliation of orders vs shipments on post-aggregate daily tables — the join-type surface's last uncovered shape")(_rex.daily_reconciliation)
register("grouping_sets_orders", _rex.GROUPING_SETS_ORDERS_SQL,
         doc="Arbitrary GROUPING SETS (the general form rollup/cube specialize)")(_rex.grouping_sets_orders)

# --- event-stream analytics (SURVEY §2.9) -----------------------------------

register("ev_tumbling_hourly", _win.TUMBLING_HOURLY_SQL,
         doc="1h tumbling window aggregation (batch dual of streaming window)")(_win.tumbling_hourly)
register("ev_sessionize", _win.SESSIONIZE_SQL,
         doc="Gap-based sessionization (lag + cumsum boundaries)")(_win.sessionize)
register("ev_top_users", _win.TOP_USERS_SQL,
         doc="Global top-k by aggregate")(_win.top_users_by_value)
register("ev_daily_active_users", _win.DAILY_ACTIVE_USERS_SQL,
         doc="Daily distinct users + cumulative analytic window")(_win.daily_active_users)
register("ev_funnel_conversion", _win.FUNNEL_CONVERSION_SQL,
         doc="Staged funnel (view→click→purchase within 24h steps), broadcast stage scalars")(_win.funnel_conversion)
register("ev_user_daily_autocorr", _win.USER_DAILY_AUTOCORR_SQL,
         doc="Gap-filled daily series + lag-1 autocorrelation (corr/stddev moment aggregates)")(_win.user_daily_autocorr)
register("ev_sliding_hourly", _win.SLIDING_HOURLY_SQL,
         doc="1h window sliding every 15min (overlapping windows; F.window size+slide)")(_win.sliding_hourly)
register("ev_trailing_7d_stats", _win.TRAILING_WINDOW_STATS_SQL,
         doc="RANGE window frame: per-user trailing-7-day stats at every event (value-based bounds, integer-us ordering)")(_win.trailing_window_stats)
register("ev_concurrent_sessions", _win.CONCURRENT_SESSIONS_SQL,
         doc="Sweep-line interval-overlap counting: active session depth at every boundary (pre-aggregated deltas + prefix sum)")(_win.concurrent_sessions)
register("ev_changepoint_cusum", _win.CUSUM_CHANGEPOINT_SQL,
         doc="Two-sided CUSUM changepoint detection (Page 1954) over the daily ingest rate: the max-recursion as cumsum-minus-prefix-min windows on the bounded day grid, exact integer ppm — catches small persistent rate shifts 3-sigma misses")(_win.cusum_changepoint)
register("ev_bot_score", _win.BOT_SCORE_SQL,
         doc="Automation/bot detection: per-user inter-event-gap regularity (exact-integer CV^2 ppm) + sub-2s burst share, flag = metronomic OR bursty — the traffic-cleaning filter before event streams count as human signal")(_win.bot_score)
register("ev_markov_transitions", _win.MARKOV_TRANSITIONS_SQL,
         doc="First-order Markov transition matrix of in-session event types (lag + gap predicate, post-aggregate row normalization)")(_win.markov_transitions)
register("ord_customer_gaps", _win.CUSTOMER_ORDER_GAPS_SQL,
         doc="lag / row_number / moving-avg sharing one window partitioning")(_win.customer_order_gaps)
register("ord_priority_islands", _win.PRIORITY_ISLANDS_SQL,
         doc="Gaps-and-islands run collapse = SCD type-2 history builder: per-customer priority regimes with valid_from/valid_to, one change-flag cumsum window (single shuffle+sort)")(_win.priority_islands)
register("ord_revenue_ewma", _win.REVENUE_EWMA_SQL,
         doc="Truncated EWMA over daily revenue: exact-cents pre-aggregate, gap-aware decay in a RANGE frame, ascending-day fold on both engines")(_win.revenue_ewma)
register("li_part_croston", _win.PART_CROSTON_SQL,
         doc="Croston intermittent-demand forecast per part (separate size/interval EWMAs over the monthly spine, rate = z/p) — one aggregate-HOF fold per part, recursive-CTE oracle certifying every part's trajectory")(_win.part_croston)
register("ord_revenue_holt", _win.REVENUE_HOLT_SQL,
         doc="Holt double-exponential smoothing over monthly revenue: ordered fold on the calendar-bounded aggregate, oracle is a recursive CTE with identical arithmetic")(_win.revenue_holt)

from .operators import semistructured as _sj  # noqa: E402

register("ev_props_json_stats", _sj.PROPS_JSON_STATS_SQL,
         doc="JSON props parsing (from_json with explicit schema) + typed aggregates")(_sj.props_json_stats)

# --- temporal joins (as-of, bounded range) ----------------------------------

from .operators import temporal as _tmp  # noqa: E402

register("ev_asof_purchase_click", _tmp.ASOF_PURCHASE_CLICK_SQL,
         doc="Left as-of join via union + ordered last() — one shuffle, no range probe")(_tmp.asof_purchase_click)
register("ev_pairs_within_5min", _tmp.EVENT_PAIRS_WITHIN_WINDOW_SQL,
         doc="Bounded range self-join via coarse-bucket equi-join decomposition")(_tmp.event_pairs_within_window)
register("ev_funnel_latency", _win.FUNNEL_LATENCY_SQL,
         doc="Funnel stage latency: first view -> first click -> first purchase per user, stage counts + p50/p90/max transition seconds in one row — where users stall and for how long")(_win.funnel_latency)
register("ev_multitouch_attribution", _tmp.MULTITOUCH_ATTRIBUTION_SQL,
         doc="Linear multi-touch attribution: clicks within 30min before a same-user purchase split its value equally — registered composition over the generic cell-decomposed range_join; integer micro-unit credits")(_tmp.multitouch_attribution)


# --- LLM-data-pipeline operators (SURVEY §2.9 north star) -------------------

from .operators import dedup as _dd  # noqa: E402
from .operators import multimodal as _mm  # noqa: E402
from .operators import similarity as _sim  # noqa: E402
from .operators import text as _tx  # noqa: E402

register("doc_exact_dedup", _dd.EXACT_DEDUP_SQL,
         doc="Exact dedup by content fingerprint (hash-groupBy)")(_dd.exact_dedup)
register("doc_minhash_signatures", _dd.MINHASH_SIGNATURES_SQL,
         doc="MinHash signatures over 3-word shingles (k=8, md5-based)")(_dd.minhash_signatures)
register("doc_lsh_candidate_pairs", _dd.LSH_CANDIDATE_PAIRS_SQL,
         doc="LSH banding → candidate pair generation (bucket equi-join)")(_dd.lsh_candidate_pairs)
register("doc_neardup_pairs", _dd.NEARDUP_PAIRS_SQL,
         doc="Full MinHash-LSH near-dup pipeline with Jaccard verification")(_dd.neardup_pairs)
register("doc_blocked_jaccard", _dd.BLOCKED_JACCARD_PAIRS_SQL,
         doc="Blocked n-gram Jaccard near-dup baseline")(_dd.blocked_jaccard_pairs)
register("doc_sorted_neighborhood", _dd.SORTED_NEIGHBORHOOD_PAIRS_SQL,
         doc="Sorted-neighborhood (merge/purge) near-dup pass: canonical sort key + W-successor window, exact Jaccard verify — the sort-based blocking family")(_dd.sorted_neighborhood_pairs)
register("doc_edit_distance_pairs", _dd.EDIT_DISTANCE_PAIRS_SQL,
         doc="Blocked edit-distance near-dup: lossless length-band blocking (|len diff|<=T => adjacent bands), threshold-capped Levenshtein verify over the ASCII projection — the metric the other blocking families only approximate")(_dd.edit_distance_pairs)
register("doc_minhash_estimate", _dd.MINHASH_ESTIMATE_SQL,
         doc="MinHash estimator calibration: signature-based Jaccard estimate vs exact per candidate pair — the store-size-vs-verify-cost decision table")(_dd.minhash_estimate_vs_exact)
register("doc_lsh_recall", _dd.LSH_RECALL_SQL,
         doc="MinHash-LSH recall contract (the dedup twin of embed_ann_recall): banded-candidate recall vs the LOSSLESS prefix-filter ground truth at the family's own Jaccard threshold — a missed pair can only be a banding miss; vacuous truth = 1e6")(_dd.lsh_recall)
register("doc_neardup_clusters", _dd.NEARDUP_CLUSTERS_SQL,
         doc="Connected components over near-dup pairs (Spark: iterative min-label propagation, driver-side loop over distributed data; oracle: WITH RECURSIVE reachability fixpoint)")(_dd.neardup_clusters)
register("doc_simhash", _dd.SIMHASH_SIGNATURES_SQL,
         doc="32-bit SimHash signatures (bitwise vote aggregation)")(_dd.simhash_signatures)
register("doc_simhash_neardup", _dd.SIMHASH_NEARDUP_PAIRS_SQL,
         doc="SimHash Hamming≤3 near-dup pairs (banded candidates, pigeonhole-exact recall)")(_dd.simhash_neardup_pairs)
register("embed_knn_bruteforce", _sim.KNN_BRUTEFORCE_SQL,
         doc="Exact cosine top-k ANN baseline (broadcast queries)")(_sim.knn_bruteforce)
register("embed_hard_negatives", _sim.HARD_NEGATIVES_SQL,
         doc="Contrastive hard-negative mining (ANCE-style): per anchor, top-k most-similar corpus vectors with a DIFFERENT label — label-mismatch filter below the two-phase top-k")(_sim.hard_negatives)
register("embed_lsh_buckets", _sim.LSH_BUCKETS_SQL,
         doc="Random-hyperplane LSH bucketing (ANN scale path)")(_sim.lsh_buckets)
register("embed_label_centroids", _sim.LABEL_CENTROID_NORMS_SQL,
         doc="Distributed dense-vector centroid aggregate")(_sim.label_centroid_norms)
register("embed_ann_ivf_topk", _sim.ANN_IVF_TOPK_SQL,
         doc="IVF ANN: centroid cells + nprobe=2 + exact in-cell re-rank")(_sim.ann_ivf_topk)
register("embed_quantize_int8", _sim.QUANTIZE_INT8_SQL,
         doc="Symmetric int8 vector quantization + reconstruction error (shuffle-free)")(_sim.quantize_int8)
register("embed_cosine_neardup", _sim.COSINE_NEARDUP_PAIRS_SQL,
         doc="Embedding-cosine near-dup (LSH blocking + exact verify)")(_sim.cosine_neardup_pairs)
register("embed_covariance", _sim.EMBEDDING_COVARIANCE_SQL,
         doc="Distributed embedding covariance (PCA/whitening reduction): one-pass centered outer products, ppm-quantized means + 1e-12 fixed-point before cross-row sums — order-exact integers")(_sim.embedding_covariance)
register("embed_kmeans", _sim.KMEANS_SQL,
         doc="Distributed Lloyd's k-means (2 unrolled iterations, label-centroid init): broadcast-assign + tiny centroid aggregate per pass, ppm-fixed-point inertia — the IVF coarse-quantizer trainer")(_sim.kmeans)
register("embed_silhouette", _sim.SILHOUETTE_SQL,
         doc="Simplified-silhouette cluster-quality eval over the shared k-means trajectory: O(n*k) nearest/second-nearest centroid distances, ppm-integer per-cluster summary")(_sim.silhouette)
register("embed_pq_encode", _sim.PQ_ENCODE_SQL,
         doc="Product quantization (Jegou et al. 2011): per-subspace codebook assignment, 256B float vectors to 8 code bytes, ppm-exact reconstruction error")(_sim.pq_encode)
register("embed_pq_adc_topk", _sim.PQ_ADC_TOPK_SQL,
         doc="PQ asymmetric-distance search: per-query M x k lookup tables, compressed corpus scored by table-lookup sums — billions of codes at RAM speed, never decompressed")(_sim.pq_adc_topk)
register("embed_ivfpq_topk", _sim.IVFPQ_ADC_TOPK_SQL,
         doc="IVFADC (Jegou et al. 2011 SIV): coarse-cell prune + residual-PQ codes scored by per-(query,cell) lookup tables — the composed billion-scale ANN layout; search cost corpus/cells x N_PROBE lookup sums per query")(_sim.ivfpq_adc_topk)
register("embed_int8_recall", _sim.INT8_RECALL_SQL,
         doc="int8-quantization eval: recall@k of the cosine ranking over round(x/scale)*scale reconstructed vectors vs the full-precision exact top-k — the accuracy contract for the 4x embed_quantize_int8 compression")(_sim.int8_recall)
register("embed_truncation_recall", _sim.TRUNCATION_RECALL_SQL,
         doc="Matryoshka-style eval: recall@k of a 16-dim prefix-truncated cosine ranking vs the full 64-dim exact top-k — the accuracy contract behind serving a 4x narrower first-stage index")(_sim.truncation_recall)
register("embed_ann_recall", _sim.ANN_RECALL_SQL,
         doc="Recall@k of the IVF probe vs exact brute-force top-k — the ANN accuracy contract, hash-verified end to end")(_sim.ann_recall)
register("embed_hamming_topk", _sim.HAMMING_TOPK_SQL,
         doc="Binary sign-sketch ANN (Charikar 2002): 64 floats -> 2 signature words (32x compression), XOR+POPCNT Hamming scan, exact-cosine rerank of the candidate head")(_sim.hamming_topk)
register("embed_hamming_recall", _sim.HAMMING_RECALL_SQL,
         doc="Recall@k of the binary-sketch retrieval vs exact brute-force top-k — the accuracy contract behind the 32x sketch compression, hash-verified end to end")(_sim.hamming_recall)
register("embed_semdedup", _sim.SEMDEDUP_SQL,
         doc="SemDeDup-style semantic dedup: quantizer cell + in-cell LSH blocking, exact-cosine verify, first-writer keep policy (arXiv:2303.09540)")(_sim.semantic_dedup)
register("doc_token_stats", _tx.TOKEN_STATS_SQL,
         doc="Token counting + lexical stats")(_tx.token_stats)
register("doc_quality_score", _tx.QUALITY_SCORE_SQL,
         doc="Composite quality scoring + bucketing")(_tx.quality_score)
register("doc_language_id", _tx.LANGUAGE_ID_SQL,
         doc="Stopword-marker language-ID heuristic")(_tx.language_id)
register("doc_rolling_fingerprint", _tx.ROLLING_FINGERPRINT_SQL,
         doc="Polynomial rolling-hash fingerprint (sequential fold)")(_tx.rolling_fingerprint)
register("doc_length_deciles", _tx.LENGTH_DECILES_SQL,
         doc="Per-language length deciles (partitioned ntile, no global sort)")(_tx.length_deciles)
register("doc_tfidf_topk", _tx.TFIDF_TOPK_SQL,
         doc="Per-doc top-k TF-IDF terms (vocabulary-keyed shuffle join, integer-ranked)")(_tx.tfidf_topk)
register("doc_bm25_topk", _tx.BM25_TOPK_SQL,
         doc="BM25 retrieval: query docs vs corpus via broadcast inverted-index probe, two-phase exact top-k")(_tx.bm25_topk)
from .operators import retrieval as _rtv  # noqa: E402

register("doc_hybrid_rrf_topk", _rtv.HYBRID_RRF_TOPK_SQL,
         doc="Hybrid retrieval: reciprocal-rank fusion (exact-integer 1e6 div (60+rank)) of the BM25 and cosine top-k cores over the paired documents/embeddings corpora")(_rtv.hybrid_rrf_topk)
register("embed_mmr_rerank", _rtv.MMR_RERANK_SQL,
         doc="MMR diversified rerank (Carbonell-Goldstein): greedy k-step selection in exact-integer ppm (7*rel - 3*maxsim), bounded pool per query, unrolled-CTE oracle certifying the whole trajectory")(_rtv.mmr_rerank)
from .operators import selection as _sel  # noqa: E402

register("embed_kcenter_coreset", _sel.KCENTER_CORESET_SQL,
         doc="Greedy k-center coreset selection (Gonzalez traversal / Sener-Savarese data selection): K scans, 1-row broadcast per step, exact-ppm trajectory + assignment census, unrolled-CTE oracle")(_sel.kcenter_coreset)
register("embed_standard_scaler", _sel.STANDARD_SCALER_SQL,
         doc="Distributed StandardScaler: per-dim z-scores from exact-integer moment sums (quantize-then-sum, the sf0.1-sweep determinism policy) — one posexplode pass + a 64-row stats broadcast")(_sel.standard_scaler)
register("doc_bpe_token_stats", _tx.BPE_TOKEN_STATS_SQL,
         doc="BPE-style pre-tokenizer profile (letter/digit/punct runs, codegen-only)")(_tx.bpe_token_stats)
register("doc_wordpiece_train", _tx.WORDPIECE_TRAIN_MERGES_SQL,
         doc="WordPiece trainer (Schuster-Nakajima / BERT): likelihood-greedy merges cnt(ab)/(cnt(a)*cnt(b)) in ppt, incremental pair+unary delta maintenance, unrolled-CTE oracle certifying the merge trajectory")(_tx.wordpiece_train_merges)
register("doc_wordpiece_encode_stats", _tx.WORDPIECE_ENCODE_STATS_SQL,
         doc="WordPiece encode path: apply the trained merges over the word table, per-doc token-vs-symbol rollup + compression ppm (the deployment shape, mirroring bpe_encode_stats)")(_tx.wordpiece_encode_stats)
register("doc_vocab_growth", _tx.VOCAB_GROWTH_SQL,
         doc="Heaps-law vocabulary growth: first-occurrence attribution over a bounded bucket grid (no running set)")(_tx.vocab_growth)
register("doc_rake_keywords", _tx.RAKE_KEYWORDS_SQL,
         doc="RAKE keyword extraction (Rose 2010): stopword-bounded phrase runs via per-doc islands, exact-integer degree/freq word scores, top-k phrases per doc")(_tx.rake_keywords)
register("doc_zipf_fit", _tx.ZIPF_FIT_SQL,
         doc="Zipf's-law rank-frequency fit: OLS of ln(freq) on ln(rank) over the top-64 terms in exact ln-fixed-point integers — the distribution-shift companion to the Heaps-law vocab growth audit")(_tx.zipf_fit)
register("doc_ngram_topk", _tx.NGRAM_TOPK_SQL,
         doc="Corpus-wide top-k trigram frequency (contamination/boilerplate detector)")(_tx.ngram_topk)
register("doc_cms_heavy_hitters", _tx.CMS_HEAVY_HITTERS_SQL,
         doc="Count-min-sketch heavy hitters: deterministic md5-indexed CMS, top-k by sketch estimate with exact count alongside (est >= true pinned)")(_tx.cms_heavy_hitters)
register("doc_distinct_tokens_approx", None,
         doc="HyperLogLog++ approximate distinct tokens per language (sketch — no exact oracle; accuracy asserted vs exact in tests)")(_tx.distinct_tokens_approx)
register("doc_token_hll_rollup", None,
         doc="Re-aggregatable HLL sketch rollup: per-lang sketches unioned to corpus total (sketch — no exact oracle; accuracy + union-consistency asserted in tests)")(_tx.token_hll_rollup)
register("mm_binary_meta", _mm.BINARY_META_SQL,
         doc="Opaque-binary metadata pass (bytes/hash/chunks)")(_mm.binary_meta)

from .operators import decontam as _dc  # noqa: E402

register("doc_decontaminate", _dc.DECONTAMINATE_SQL,
         doc="Benchmark decontamination: n-gram overlap vs held-out set (broadcast bench shingles)")(_dc.decontaminate)
register("doc_bloom_decontaminate", _dc.BLOOM_DECONTAMINATE_SQL,
         doc="Bloom-prefiltered decontamination (huge-bench path: bloom_filter_agg + might_contain prefilter + shuffled exact confirm — exact result)")(_dc.bloom_decontaminate)

from .operators import quality as _ql  # noqa: E402

register("doc_repetition_stats", _ql.REPETITION_STATS_SQL,
         doc="Gopher-rule repetition profile: top-unigram + dup n-gram fractions, keep/drop flag")(_ql.repetition_stats)
register("doc_gopher_rules", _ql.GOPHER_RULES_SQL,
         doc="The full Gopher quality-filter rule set (Rae et al. 2021 A1.1, thresholds verbatim): word count, mean word length, symbol/bullet/ellipsis ratios, alpha-word share, stopword presence — per-rule verdicts + conjunction, one map-only projection")(_ql.gopher_rules)
register("doc_winnowing", _ql.WINNOWING_SQL,
         doc="Winnowing (MOSS) fingerprint selection: window-min of k-gram hashes, zero shuffles")(_ql.winnowing_fingerprints)
register("doc_winnowing_overlap", _ql.WINNOWING_OVERLAP_SQL,
         doc="The MOSS detection half (Schleimer et al. 2003): pairs joined on shared winnowed fingerprints (24-char grams, stop-fingerprint cap bounds join fan-out), exact containment ppm — never all-pairs")(_ql.winnowing_overlap)
register("doc_char_entropy", _ql.CHAR_ENTROPY_SQL,
         doc="Per-doc character Shannon entropy (junk/noise signal): in-expression histogram, zero shuffles, ppm-quantized terms")(_ql.char_entropy)
register("dq_length_drift_psi", _ql.LENGTH_DRIFT_PSI_SQL,
         doc="Population Stability Index of each source's length distribution vs the corpus: fixed bins + add-one smoothing, one map-side-combined aggregate")(_ql.length_drift_psi)
register("doc_pii_scrub", _ql.PII_SCRUB_SQL,
         doc="PII redaction pass: sequential email/IPv4/long-number count+replace over a derived contact block, scrubbed-text md5 — certifies the regex patterns across Java regex and RE2; pure codegen map pass, no shuffle")(_ql.pii_scrub)

from .operators import classifier as _cl  # noqa: E402

register("doc_quality_classifier", _cl.QUALITY_CLASSIFIER_SQL,
         doc="CCNet-style domain-discriminator quality filter: logistic regression trained by integer-exact distributed GD (rational sigmoid, ppb gradient quantization), scores every doc")(_cl.quality_classifier)
register("ev_retention_cohorts", _win.RETENTION_COHORTS_SQL,
         doc="Cohort retention triangle: first-seen week × week offset distinct users")(_win.retention_cohorts)

from .operators import chunking as _ck  # noqa: E402

register("doc_chunks", _ck.DOC_CHUNKS_SQL,
         doc="Fixed-size overlapping chunking (sequence+explode+substring, shuffle-free)")(_ck.doc_chunks)
register("doc_pack_bins", _ck.PACK_BINS_SQL,
         doc="Deterministic next-fit sequence packing into 1024-token bins per lang shard")(_ck.pack_bins)

from .operators import sampling as _smp  # noqa: E402

register("doc_stratified_sample", _smp.STRATIFIED_SAMPLE_SQL,
         doc="Content-hash stratified sampling (deterministic under repartition/replay)")(_smp.stratified_sample)
register("doc_leakage_safe_split", _smp.LEAKAGE_SAFE_SPLIT_SQL,
         doc="Train/val/test split keyed on the content fingerprint — byte-identical duplicates can never straddle splits (eval-contamination guard)")(_smp.leakage_safe_split)
register("doc_shard_assignment", _smp.SHARD_ASSIGNMENT_SQL,
         doc="Deterministic training-shard manifest: content-hash sharding + order-independent checksums (audit twin of sinks.write_training_shards)")(_smp.shard_assignment)
from .operators import corpus_pipeline as _cp  # noqa: E402

register("doc_corpus_pipeline", _cp.CORPUS_PIPELINE_SQL,
         doc="Composed corpus pipeline funnel: quality → canonical dedup → near-dup novelty → decontaminate → chunk/pack counts")(_cp.corpus_pipeline)
register("doc_source_mix", _smp.SOURCE_MIX_SQL,
         doc="Weighted source mixing: fractional up/downsampling with deterministic copies")(_smp.source_mix)
register("doc_source_temperature_mix", _smp.SOURCE_TEMPERATURE_MIX_SQL,
         doc="Alpha-temperature source sampling policy (mT5-style, alpha=0.5 via correctly-rounded sqrt): exact-integer shares and boost factors")(_smp.source_temperature_mix)
register("doc_doremi_weights", _smp.DOREMI_WEIGHTS_SQL,
         doc="DoReMi-family mixture reweighting (arXiv:2305.10429): linearized Hedge over per-source excess unigram-LM loss, exact bigint trajectory (no libm exp), whole T-step path certified by the gate hash")(_smp.doremi_weights)
register("doc_epoch_shuffle", _smp.EPOCH_SHUFFLE_SQL,
         doc="Deterministic per-epoch training-order export: md5-keyed permutation per epoch via ONE composite two-phase distributed rank (no per-epoch single-task sort), (pos, shard, slot) layout")(_smp.epoch_shuffle)
register("doc_weighted_sample", _smp.WEIGHTED_SAMPLE_SQL,
         doc="Efraimidis-Spirakis weight-proportional sample without replacement (content-hash keys, TakeOrderedAndProject top-k — O(k) memory per task, no corpus shuffle)")(_smp.weighted_sample)

from .operators import corpus_analytics as _ca  # noqa: E402

register("doc_unigram_lm_score", _ca.UNIGRAM_LM_SCORE_SQL,
         doc="Unigram-LM quality proxy: per-doc avg negative log-likelihood, ppm fixed-point (CCNet-style cheap perplexity)")(_ca.unigram_lm_score)
register("doc_bigram_lm_score", _ca.BIGRAM_LM_SCORE_SQL,
         doc="Interpolated bigram LM (Jelinek-Mercer): lambda*c(prev,w)/c(prev.) + (1-lambda)*c(w)/N, ppm fixed-point — sees the word-order signal the unigram proxy cannot")(_ca.bigram_lm_score)
register("doc_kn_perplexity", _ca.KN_PERPLEXITY_SQL,
         doc="Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995; Chen & Goodman 1999): (max(c-D,0) + D*N1+(prev.)*p_cont(w))/c(prev.) with the continuation-count backoff, ppm fixed-point — the smoothed-LM estimator CCNet ranks by (arXiv:1911.00359 uses a KN KenLM)")(_ca.kn_perplexity)
register("doc_quality_funnel", _ql.QUALITY_FUNNEL_SQL,
         doc="The published-filter canon composed: Gopher A1.1 rules AND Table A1 repetition AND C4 s2.2 page rules per document, family verdicts surfaced beside the conjunction; the (doc_id, text) base materializes once and all three families read it")(_ql.quality_funnel)
register("doc_c4_clean", _ql.C4_CLEAN_SQL,
         doc="C4 line-level cleaning (arXiv:1910.10683 s2.2, thresholds verbatim): keep lines ending in terminal punctuation with >=5 words, drop pages with <3 sentences / '{' / 'lorem ipsum'; line-retention audit + cleaned-text md5 — one map-only projection")(_ql.c4_clean)
register("doc_c4_blocklist_clean", _ql.C4_BLOCKLIST_CLEAN_SQL,
         doc="C4 cleaning with the paper's word-blocklist page rule as a POLICY INPUT (Raffel et al. 2020 s2.2): exact token match against a broadcast list, has_blocked surfaced and conjoined; empty-list result identical to doc_c4_clean (test-pinned)")(_ql.c4_blocklist_clean)
register("doc_gopher_rules_unicode", _ql.GOPHER_RULES_UNICODE_SQL,
         doc="Gopher rule set with the alpha-word class widened to \\p{L} (the r9 advisor's multilingual note, closed behind a flag): non-ASCII-letter words satisfy the alphabetic rule as the paper wrote it; default ASCII variant unchanged")(_ql.gopher_rules_unicode)
register("doc_gopher_repetition", _ql.GOPHER_REPETITION_SQL,
         doc="Gopher repetition filter (arXiv:2112.11446 Table A1 rows 1-4, thresholds verbatim): duplicate line/paragraph fractions by count and by character mass at the first-writer grain, exact ppm integers, conjunction flag")(_ql.gopher_repetition)
register("doc_kn_heldout", _ca.KN_HELDOUT_SQL,
         doc="Held-out Kneser-Ney scoring (train on even doc_ids, score odd): drives the smoothing's backoff cascade — unseen bigrams (discount-only), unseen contexts (pure continuation), OOV targets (counted, excluded) — through the cross-engine hash gate; the CCNet frozen-model deployment shape as a batch query")(_ca.kn_heldout)
register("doc_kn3_perplexity", _ca.KN3_PERPLEXITY_SQL,
         doc="Recursive interpolated Kneser-Ney TRIGRAM perplexity (Chen & Goodman 1999 eq. 4.25-4.27): trigram ML discount backing off through the continuation-count bigram estimate to the unigram continuation — sees word-order structure beyond adjacent pairs (two docs with identical bigram multisets separate)")(_ca.kn3_perplexity)
register("doc_kn4_perplexity", _ca.KN4_PERPLEXITY_SQL,
         doc="Recursive interpolated Kneser-Ney 4-GRAM perplexity: raw-count top level over continuation-count level-3/2/1 estimates (Chen & Goodman 1999 eq. 4.25-4.27 one order below KenLM) — all lower tables shared with the order-5 sibling")(_ca.kn4_perplexity)
register("doc_kn5_perplexity", _ca.KN5_PERPLEXITY_SQL,
         doc="FULL KenLM-order recursive Kneser-Ney 5-gram perplexity (Wenzek et al. 2020 s3 rank by a 5-gram KN KenLM; Heafield 2011): the deepest backoff cascade, stepwise p1->p5 IEEE-identical across engines; doc_ccnet_buckets and the frozen-cut service re-bind on this score")(_ca.kn5_perplexity)
register("doc_kn5_heldout", _ca.KN5_HELDOUT_SQL,
         doc="Held-out order-5 KN scoring (train even doc_ids, score odd): drives the DEEP backoff cascade — unseen 5-grams, unseen contexts at each of four levels, OOV targets (counted, excluded, -1 sentinel) — through the cross-engine hash gate")(_ca.kn5_heldout)
register("doc_mink_prob", _ca.MINK_PROB_SQL,
         doc="Min-k% probability membership signal (Shi et al. 2024): per doc, mean NLL of its k% least-likely bigrams under the shared interpolated model — the distributional memorization/contamination detector the exact-match decontamination queries cannot see")(_ca.mink_prob)
register("doc_shingle_novelty", _ca.SHINGLE_NOVELTY_SQL,
         doc="Substring-dedup attribution: per-doc fraction of shingles first seen in an earlier doc (first-writer-wins)")(_ca.shingle_novelty)
register("doc_dedup_keep_best", _ca.DEDUP_KEEP_BEST_SQL,
         doc="Exact-dup keep-best policy: retain longest member per (lang, fingerprint) group")(_ca.dedup_keep_best)
register("li_basket_affinity", _ca.BASKET_AFFINITY_SQL,
         doc="Market-basket part affinity: order-keyed co-occurrence self-join (bounded by basket size, never part x part), lift over exact-integer ratios")(_ca.basket_affinity)
register("li_copurchase_triangles", _ca.COPURCHASE_TRIANGLES_SQL,
         doc="Per-part triangle count + clustering coefficient on the thresholded co-purchase graph (oriented a<b<c wedge join, each triangle counted once)")(_ca.copurchase_triangles)
register("doc_unigram_tokenizer", _tx.UNIGRAM_TOKENIZER_SQL,
         doc="SentencePiece-family unigram-LM tokenizer trainer (Kudo 2018, hard-EM): substring seed vocab, 2 EM rounds of (single-expression Viterbi segment, add-one re-estimate) on the Zipf-bounded word table — corpus touched once; top pieces by final count, integer-ppm shares")(_tx.unigram_tokenizer)
register("ord_seasonal_index", _win.SEASONAL_INDEX_SQL,
         doc="Classical seasonal decomposition: ratio of monthly revenue to the 2x12 centered moving average (exact-integer numerator, dense year*12+month index so RANGE frames survive calendar gaps), mean ratio per calendar month")(_win.seasonal_index)
register("doc_curriculum_order",
         _smp.CURRICULUM_ORDER_SQL.format(quality_sql=_tx.QUALITY_SCORE_SQL),
         doc="Curriculum training-order export: quality decile descending with a deterministic md5 shuffle within each tier, materialized as the (pos, shard, slot) layout contract — two passes of the size-adaptive two-phase rank, no unpartitioned window")(_smp.curriculum_order)
register("doc_retrieval_label_eval", _rtv.RETRIEVAL_LABEL_EVAL_SQL,
         doc="Labeled retrieval eval grid: MRR (1e6 div first-relevant-rank) and precision@k for BM25, exact-cosine dense, and RRF hybrid against label relevance — the whole eval harness (rankings, relevance join, metrics) hash-verified as one query")(_rtv.retrieval_label_eval)
register("doc_unigram_encode_stats", _tx.UNIGRAM_ENCODE_STATS_SQL,
         doc="Encode path of the unigram tokenizer: Viterbi-segment the word table under the FINAL trained piece log-probs, roll up per doc (whitespace tokens vs pieces, exact-integer compression ppm); over-cap words encode as characters")(_tx.unigram_encode_stats)
register("embed_cluster_labels", _ca._CLUSTER_LABELS_SQL(),
         doc="Data-map cluster labeling (c-TF-IDF family): per final k-means cluster, top terms by integer-exact lift of in-cluster term share over corpus share — embeddings decide the grouping, text supplies the evidence, joined on vec_id = doc_id")(_ca.cluster_labels)
register("embed_semdedup_keep_best", _ca._SEMDEDUP_KEEP_BEST_SQL(),
         doc="Quality-weighted semantic dedup: embeddings decide WHAT is redundant, the documents table decides WHICH copy survives — cross-table argmax policy over the embed_semdedup attribution groups")(_ca.semdedup_keep_best)
register("doc_dsir_weights", _ca.DSIR_WEIGHTS_SQL,
         doc="DSIR importance weights (Xie et al. 2023): hashed-bigram target-vs-raw log ratios, md5-bucketed features, ppm-exact per-feature terms — the domain-matched selection signal feeding the samplers")(_ca.dsir_weights)
register("doc_source_kl", _ca.SOURCE_KL_SQL,
         doc="Pairwise source KL divergence over the top-M head vocabulary (bounded grid, add-one smoothing, pico fixed-point)")(_ca.source_kl)
register("doc_span_scrub", _ca.SPAN_SCRUB_SQL,
         doc="Duplicate-span REMOVAL (arXiv:2107.06499 at shingle granularity): first-writer attribution, merged covered positions, filter-by-index text rebuild")(_ca.span_scrub)
register("doc_ccnet_buckets", _ca.CCNET_BUCKETS_SQL,
         doc="CCNet head/middle/tail perplexity buckets per language (arXiv:1911.00359): KenLM-order 5-gram Kneser-Ney NLL terciles (the paper's exact estimator, r10) via language-partitioned ntile, summary grid with bucket boundaries")(_ca.ccnet_buckets)
register("doc_span_dedup", _ca.SPAN_DEDUP_SQL,
         doc="Length-gated exact-substring dedup (arXiv:2107.06499 ExactSubstr / C4 repeated-span rule): only maximal duplicate-shingle runs >= SPAN_MIN_TOKENS tokens are removed, first writer keeps its copy; per-doc span/token removal audit + scrubbed-text md5")(_ca.span_dedup)
register("doc_source_overlap", _ca.SOURCE_OVERLAP_SQL,
         doc="Cross-source contamination: pairwise shingle containment/Jaccard between sources")(_ca.source_overlap)
register("embed_topk_per_label", _ca.TOPK_PER_LABEL_SQL,
         doc="Per-label top-k most-central vectors (cosine to own-label centroid, broadcast centroids)")(_ca.topk_per_label)
register("ev_value_anomaly", _ca.VALUE_ANOMALY_SQL,
         doc="Per-type 3-sigma value outliers (tiny stats aggregate broadcast back; no full-table window)")(_ca.value_anomaly)
register("doc_langid_confusion", _tx.LANGID_CONFUSION_SQL,
         doc="Language-ID confusion matrix vs the labeled column: per (labeled, guessed) cell counts + exact-ppm shares — the whole model eval as one hash-verified query")(_tx.langid_confusion)
register("doc_bpe_train_merges", _tx.BPE_TRAIN_MERGES_SQL,
         doc="Distributed BPE tokenizer training (Sennrich et al. 2016): first 3 merges on the Zipf-bounded word-frequency table — per step one vocab explode, one pair count, one global top-1, one broadcast apply")(_tx.bpe_train_merges)
register("doc_bpe_encode_stats", _tx.BPE_ENCODE_STATS_SQL,
         doc="BPE encode path: apply the trained merges as a vocab-table lookup joined back to the token stream — per-doc whitespace-vs-BPE symbol counts and exact-ppm compression")(_tx.bpe_encode_stats)
register("doc_tokenizer_fertility", _tx.TOKENIZER_FERTILITY_SQL,
         doc="Tokenizer-selection grid: corpus-level fertility (subword units per word) and compression for BOTH trained tokenizers (BPE merges vs unigram-LM Viterbi) — pure composition of the two encode paths, one hash-verified row per system")(_tx.tokenizer_fertility)
register("li_basket_rules", _ca.BASKET_RULES_SQL,
         doc="Directed association rules a->b: confidence n_ab/n_a and support share as exact-ppm integers — the asymmetric half of basket affinity, from the same cached pair base")(_ca.basket_rules)
from .operators import graph as _gr  # noqa: E402

register("li_part_components",
         _gr.PART_COMPONENTS_SQL.format(minsup=_ca.BASKET_MIN_SUPPORT),
         doc="Connected components of the co-purchase affinity graph via alternating large-star/small-star contraction (Kiveris et al. 2014) — O(log^2 n) rounds on any topology, vs the O(diameter) min-label propagation the near-dup clusters use")(_gr.part_components)
register("li_part_kcore",
         _gr.PART_KCORE_SQL.format(minsup=_ca.BASKET_MIN_SUPPORT),
         doc="K-core of the co-purchase graph (Seidman 1983): fixed-round peeling of nodes with < K surviving neighbors — the cohesive trading core, fourth consumer of the shared pair base; convergence within the round budget is test-asserted")(_gr.part_kcore)
register("li_part_pagerank", _ca.PART_PAGERANK_SQL,
         doc="PageRank over the part co-purchase graph: 2 unrolled power iterations, ppb-integer ranks, per-edge contributions floored before cross-row sums — the driver holds only the loop counter")(_ca.part_pagerank)
register("ord_cohort_ltv", _win.COHORT_LTV_SQL,
         doc="Cohort LTV curves: first-order-month cohorts x months-since-acquisition, integer-cents cumulative revenue and per-customer LTV — the orders-side companion to event retention")(_win.cohort_ltv)
register("ord_abc_pareto", _rex.ABC_PARETO_SQL,
         doc="ABC/Pareto classification: global revenue ranking on the post-aggregate customer table, integer-cents cumulative shares, class cuts on integer cross-products — no float boundary decisions")(_rex.abc_pareto)
register("ord_price_equidepth", _rex.PRICE_EQUIDEPTH_SQL,
         doc="Exact equi-depth price histogram: two-phase distributed global rank + integer ntile recompute — data-decided bucket edges with no single-partition sort")(_rex.price_equidepth)
register("ev_value_mad_anomaly", _ca.VALUE_MAD_ANOMALY_SQL,
         doc="Robust per-type outliers: modified z-score 0.6745*(x-med)/MAD — immune to the masking that inflates sigma; same broadcast-stats, no-full-table-window plan as the sigma rule")(_ca.value_mad_anomaly)
register("ord_rfm_segments", _ca.RFM_SEGMENTS_SQL,
         doc="RFM customer segmentation: recency/frequency/monetary quartiles via deterministic ntile")(_ca.rfm_segments)

from .operators import layout as _lay  # noqa: E402

register("ord_zorder_key", _lay.ZORDER_KEY_SQL,
         doc="Z-order (Morton) clustering key over (price, date) — the layout-optimizer key behind min/max file skipping; pure codegen integer interleave, bit-exact oracle")(_lay.zorder_key)
register("mm_png_roundtrip", _mm.PNG_ROUNDTRIP_SQL,
         doc="REAL-codec round-trip: text bytes -> grayscale PNG -> decode, dims+pixel md5 predicted arithmetically by the oracle")(_mm.png_roundtrip)
register("mm_jpeg_roundtrip", _mm.JPEG_ROUNDTRIP_SQL,
         doc="REAL lossy codec round-trip: baseline JPEG (DCT + Annex K quant + Huffman) on flat even-offset blocks, where quantization is provably lossless — decoded-pixel md5 predicted arithmetically by the oracle")(_mm.jpeg_roundtrip)
register("mm_wav_loudness", _mm.WAV_LOUDNESS_SQL,
         doc="REAL-codec audio featurization: code-point PCM -> WAV encode/decode -> peak/RMS, predicted arithmetically by the oracle")(_mm.wav_loudness)
register("mm_frame_sample", _mm.FRAME_SAMPLE_SQL,
         doc="REAL frame sampling: ANIM container mux -> demux -> every-4th-frame PNG decode, width+pixel md5 predicted arithmetically")(_mm.frame_sample)
register("mm_jpeg_color_roundtrip", _mm.JPEG_COLOR_ROUNDTRIP_SQL,
         doc="REAL color JPEG round-trip: YCbCr 4:2:0 MCUs through per-component Annex K quant + four Huffman tables on the per-channel lossless grids (Y-128 even / chroma 128±17k) — all three decoded planes predicted arithmetically")(_mm.jpeg_color_roundtrip)
register("mm_phash_neardup", _mm.PHASH_NEARDUP_SQL,
         doc="Perceptual image near-dup: real pixel pHash (area-mean pool + 32-pt DCT + sign-vs-AC-mean bits) per derived image, 4x16-bit banded Hamming equi-join, hd <= 10 — the oracle computes the exact DCT sandwich G@T@G^T of the tile matrix in SQL")(_mm.phash_neardup)
register("mm_phash_clusters", _mm.PHASH_CLUSTERS_SQL,
         doc="Perceptual duplicate clusters: star-contraction components over the verified pHash pair graph, keep-min summary — oracle runs the same pair SQL through a recursive-CTE reachability")(_mm.phash_clusters)
register("mm_audio_fingerprint", _mm.AUDIO_FINGERPRINT_SQL,
         doc="Audio constellation fingerprint (Wang 2003): real synthesize -> WAV encode/decode -> rFFT -> top-3 peak bins per segment; gain/phase variant emits the SAME print — oracle predicts the FFT peaks arithmetically (bin-aligned tones, no leakage, 1.7e4 margin)")(_mm.audio_fingerprint)
register("mm_audio_neardup", _mm.AUDIO_NEARDUP_SQL,
         doc="Audio near-dup: sounds sharing >= 2 time-aligned segment constellations (Shazam anchor-hash matching as a blocking equi-join)")(_mm.audio_neardup)
register("mm_video_phash", _mm.VIDEO_PHASH_SQL,
         doc="Per-frame video pHash: real ANIM demux -> PNG decode -> pHash per frame for an original cut and a temporally re-sampled variant — every frame hash predicted arithmetically")(_mm.video_phash)
register("mm_video_phash_neardup", _mm.VIDEO_PHASH_NEARDUP_SQL,
         doc="Video near-dup: videos sharing >= 2 frame pHashes as a bag (robust to temporal re-sampling); frame-hash equi-join blocking")(_mm.video_phash_neardup)
register("doc_profile", _ca.CORPUS_PROFILE_SQL,
         doc="Corpus admission audit: rows/nulls/empties, dimension cardinalities, char-length distribution in one scan")(_ca.corpus_profile)

from .operators import textnorm as _tn  # noqa: E402

register("doc_normalized_dedup", _tn.NORMALIZED_DEDUP_SQL,
         doc="Unicode-canonical dedup: NFC+lowercase via Arrow-batched pandas_udf (the one op needing Python — Spark has no NFC builtin)")(_tn.normalized_dedup)


# --- driver-window ordering -------------------------------------------------
#
# The driver's correctness gate records verdicts for only the FIRST 50
# registry entries per round (time/size-capped window). After r6 the
# union of windows covers every entry; from here the rotation policy
# is: (1) never-verified new queries first, (2) every query whose
# SHARED CODE changed this round (the "no query's shared code newer
# than its last driver verdict" invariant), (3) backfill with the
# OLDEST verdicts (ages from the CORRECTNESS_r0*.json union; see the
# per-tier comments inside the list). Past windows' rationales live in
# git history (r7: 6644f45^, r8: d8288f2^).

_PRIORITY = [
    # The round-10 window. Rotation policy (standing since r7):
    # (1) never-driver-verified new queries first, (2) every query
    # whose SHARED CODE changed this round, (3) backfill with the
    # OLDEST verdicts (ages computed from the CORRECTNESS_r0*.json
    # union).
    # 1. never driver-verified (new in r10)
    "doc_kn4_perplexity", "doc_kn5_perplexity", "doc_kn5_heldout",
    "doc_c4_blocklist_clean", "doc_gopher_rules_unicode",
    "doc_lsh_recall",
    # 2a. doc_ccnet_buckets is RE-BOUND onto the order-5 KN score
    # (results intentionally changed — oracle changed in lockstep);
    # the bigram/trigram KN family's shared derivations gained the
    # order-4/5 consumers (code identical, re-verified per invariant)
    "doc_ccnet_buckets", "doc_kn_perplexity", "doc_kn3_perplexity",
    "doc_kn_heldout",
    # 2b. the C4 projection normalizes CR before line filtering (the
    # r9 advisor's cross-engine '$' anchor divergence) and gained the
    # blocklist parameter; the funnel composition moved into the
    # shared quality_funnel_from; gopher_flags_from gained the
    # unicode_alpha parameter (default expression identical)
    "doc_c4_clean", "doc_quality_funnel", "doc_gopher_rules",
    # 3. oldest-verdict backfill: the full remaining r5 cohort ...
    "doc_char_entropy", "doc_cms_heavy_hitters", "doc_dsir_weights",
    "doc_epoch_shuffle", "doc_langid_confusion",
    "doc_leakage_safe_split", "doc_quality_classifier",
    "doc_shard_assignment", "doc_sorted_neighborhood", "doc_source_kl",
    "doc_source_temperature_mix", "doc_unigram_tokenizer",
    "doc_vocab_growth", "dq_daily_reconciliation",
    "dq_length_drift_psi", "embed_cluster_labels",
    "embed_hamming_topk", "embed_semdedup_keep_best",
    "embed_silhouette", "ev_concurrent_sessions", "ev_funnel_latency",
    "ev_markov_transitions", "ev_multitouch_attribution",
    "ev_sliding_hourly", "li_copurchase_triangles", "ord_abc_pareto",
    "ord_cohort_ltv", "ord_price_equidepth", "ord_priority_islands",
    "ord_revenue_holt",
    # ... then the oldest r6 entries (alphabetical within the age
    # tier) to fill 50
    "cube_orders", "doc_curriculum_order", "doc_dedup_keep_best",
    "doc_weighted_sample", "embed_hamming_recall",
    "embed_hard_negatives", "embed_int8_recall",
    # ---- 50-entry window boundary ----
    # Everything below keeps its most recent green driver verdict
    # (r5-r9) on code unchanged since that verdict.
]

REGISTRY = {
    **{n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY},
    **{n: q for n, q in REGISTRY.items() if n not in set(_PRIORITY)},
}


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle_sql for name, q in REGISTRY.items() if q.oracle_sql is not None}
