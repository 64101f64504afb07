"""Relational analytics operators over the TPC-H-ish star schema.

The reference exposes its tables "for downstream SQL" without ever
joining them (SURVEY §2.3) — these queries ARE that downstream surface,
plus the full set of operators Spark gives for free (joins of every
shape, grouped/rollup aggregation, distinct counting, set ops, window
top-k) exercised explicitly so the driver gate pins their semantics.

Scale design notes (100 TB):
  * Fact tables (lineitem, orders) only ever shuffle on their join/agg
    keys; dimensions (region, nation, customer at DW scale) are
    broadcast — no shuffle of the big side.
  * Aggregates are partial (map-side combine) by construction —
    groupBy().agg() on associative functions.
  * Float-valued aggregates are rounded at the boundary (round(x, 2))
    to make results reproducible across summation orders — required
    for cross-engine hash equality and good hygiene for any
    parallel-deterministic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io.load(spark, sf_dir, name)


# --- TPC-H Q1 shape: scan + filter + grouped multi-aggregate ---------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: the canonical grouped-aggregate scan. One shuffle on the
    2-value group key; everything before it is a codegen'd scan+filter
    with the shipdate predicate pushed to parquet."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 shape: selective 3-way join + top-k -------------------------

def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: customer ⋈ orders ⋈ lineitem with selective filters, revenue
    per order, deterministic top-10. Customer (dim) broadcasts; the
    orders↔lineitem join shuffles on orderkey only."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-01-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1999-01-01"))
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- TPC-H Q5 shape: 6-way snowflake join ----------------------------------

def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: the 6-table snowflake. All dimension hops broadcast; the only
    shuffles are the two fact-side equi-joins and the final 1-row-per-
    nation aggregate."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""


# --- window top-k per group -------------------------------------------------

def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order volume within each nation —
    Window.partitionBy + row_number ≤ k, the scalable top-k-per-group
    pattern (single shuffle on the partition key, no global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    vol = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
    return (
        vol.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rk")
    )


TOP_CUSTOMERS_PER_NATION_SQL = """
WITH vol AS (
  SELECT c_nationkey, c_custkey, c_name,
         round(sum(o_totalprice), 2) AS total_spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_custkey, c_name
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY total_spend DESC, c_custkey) AS rk
  FROM vol
)
SELECT n_name, c_custkey, c_name, total_spend, rk
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE rk <= 3
"""


# --- distinct counting ------------------------------------------------------

def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counting per group (Catalyst expands
    to one aggregate per distinct column — partial-aggregated, no
    driver involvement)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


DISTINCT_COUNTS_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- set operations ---------------------------------------------------------

def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set operation: distinct customers who ordered in 1999,
    minus the BUILDING segment — set difference is a shuffle-distinct +
    anti semantics under the hood (INTERSECT is the same machinery with
    the membership test flipped)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    orderers = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01")) & (F.col("o_orderdate") < F.lit("2000-01-01"))
        )
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return orderers.exceptAll(building).distinct().orderBy("custkey")


SET_OPS_CUSTOMERS_SQL = """
SELECT DISTINCT o_custkey AS custkey
FROM orders
WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY custkey
"""


# --- rollup / grouping sets -------------------------------------------------

def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping indicators — hierarchical totals in one
    pass (Spark expands to a single Expand + aggregate, still partial-
    aggregated)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
    )


ROLLUP_SALES_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n_rows,
       grouping(l_returnflag) AS g_rf,
       grouping(l_linestatus) AS g_ls
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- anti join --------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the same primitive the reference
    implements procedurally as its dedup existence check (P10/A1)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_no_orders"))
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_nationkey, count(*) AS n_customers_no_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


# --- pivot ------------------------------------------------------------------

def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity by returnflag × linestatus as columns (explicit
    value list → no extra distinct-values job)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )


PIVOT_RETURNFLAG_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# --- TPC-H Q6 shape: pure scan + filter + single aggregate ------------------

def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: the minimal full-scan aggregate — every predicate pushes to
    the parquet scan, no shuffle at all (partial sums + one final
    reduce). At 100 TB this is the query shape that proves pushdown:
    the scan should read only 4 columns and skip row groups on
    l_shipdate min/max."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


FORECAST_REVENUE_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- TPC-H Q10 shape: returned-item top-k over a 4-way join -----------------

def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returns per customer in one quarter, top 20.
    The orders↔lineitem shuffle is the only big exchange; customer and
    nation broadcast. Top-k via sort+limit collapses under AQE to a
    single-partition take."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- TPC-H Q14 shape: conditional aggregate over a fact↔dim join ------------

def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month — CASE-gated sum over a
    broadcast part join; the ratio is computed post-aggregate so the
    query stays a single shuffle-free broadcast join + 1-row reduce."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


PROMO_REVENUE_SHARE_SQL = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --- TPC-H Q18 shape: HAVING-filtered agg feeding a join --------------------

def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds a threshold, with their
    customers. The HAVING aggregate runs first and is tiny, so it
    broadcasts INTO the orders join — the big lineitem table shuffles
    once (on its natural key), everything after is broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 190)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 190) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- CUBE -------------------------------------------------------------------

def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping sets in one Expand
    + partial-aggregated pass (the multi-dimensional dual of
    rollup_sales)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").alias("g_st"),
            F.grouping("o_orderpriority").alias("g_pr"),
        )
    )


CUBE_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n_orders,
       grouping(o_orderstatus) AS g_st,
       grouping(o_orderpriority) AS g_pr
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- exact percentiles ------------------------------------------------------

def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90 / p99) of extended
    price per returnflag. Spark's `percentile` is the exact sort-based
    aggregate (same linear-interpolation definition as DuckDB's
    quantile_cont); at 100 TB the swap-in is `approx_percentile`, whose
    t-digest sketch is partial-aggregated — same query shape, bounded
    memory."""
    l = _t(spark, sf_dir, "lineitem")
    pct = lambda q, name: F.round(
        F.expr(f"percentile(l_extendedprice, {q})"), 4
    ).alias(name)
    return l.groupBy("l_returnflag").agg(
        pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
    )


PRICE_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       round(avg(l_extendedprice), 4) AS mean_price
FROM lineitem GROUP BY l_returnflag
"""


APPROX_PCT_ACCURACY = 10_000  # 1/accuracy relative-rank error bound


def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path of price_percentiles EXECUTED, not just
    documented: `approx_percentile` partial-aggregates a bounded-memory
    quantile sketch map-side (no per-group full sort, no single-node
    value buffer), at a bounded rank error. No SQL oracle — DuckDB's
    approx sketch is a different algorithm — so the driver records the
    rows-only check; the accuracy contract vs the EXACT operator is
    pinned in tests/test_operators.py."""
    l = _t(spark, sf_dir, "lineitem")
    pct = lambda q, name: F.round(
        F.expr(f"approx_percentile(l_extendedprice, {q}, {APPROX_PCT_ACCURACY})"), 4
    ).alias(name)
    return l.groupBy("l_returnflag").agg(
        pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
    )


# --- TPC-H Q7 shape: directed two-nation trade volume -----------------------

def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: yearly shipping volume between two nations, both directions.
    Supplier/customer nation hops are broadcast; the lineitem↔orders
    shuffle is the only large exchange, and the year projection happens
    before aggregation so the group key is tiny."""
    n1, n2 = "NATION_1", "NATION_2"
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pair = (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2) | (
        (F.col("supp_nation") == n2) & (F.col("cust_nation") == n1)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s.select("s_suppkey", "supp_nation")), l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c.select("c_custkey", "cust_nation")), o.o_custkey == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


NATION_TRADE_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
     OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- TPC-H Q13 shape: outer-join double aggregation (histogram) -------------

def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of orders-per-customer including zero-order
    customers — LEFT join then two stacked aggregations. The first agg
    shuffles on custkey; the histogram agg's key (a count) has tiny
    cardinality, so the second exchange is negligible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q15 shape: aggregate ⋈ its own max ------------------------------

def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum quarterly revenue — the aggregate
    joined against its own global max. The revenue relation is computed
    once (lazy localCheckpoint) and its 1-row max broadcasts back; no
    window-over-everything single-partition sort."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- TPC-H Q17 shape: per-group scalar threshold -----------------------------

def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from orders below 20% of a part's average quantity,
    for one brand. The per-part average is a correlated scalar in TPC-H;
    set-oriented it is an aggregate of the SAME filtered scan joined
    back on partkey — brand-filtered part broadcasts into both sides, so
    only lineitem shuffles (once, on partkey)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    l = _t(spark, sf_dir, "lineitem")
    lb = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    thresholds = lb.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lb.join(thresholds, lb.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH lb AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'
), thresholds AS (
  SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_threshold
  FROM lb GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_small_orders
FROM lb JOIN thresholds ON l_partkey = t_partkey
WHERE l_quantity < qty_threshold
"""
