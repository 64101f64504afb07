"""Remaining TPC-H query shapes (q2/q4/q8/q9/q11/q12/q16/q19/q20/q21/q22),
adapted to the driver's TPC-H-ish schema.

Together with `relational.py` this completes all 22 TPC-H query shapes —
the full relational-operator surface the reference leaves to "downstream
SQL" (SURVEY §2.3: the schema is designed for consumers to join/aggregate;
`maillog2db.go:86,100` is the only join key it ever declares).

Schema adaptations (the driver testdata has no partsupp, no
l_commitdate/l_receiptdate, no p_container, no c_phone):
  * partsupp is DERIVED: distinct (l_partkey, l_suppkey) pairs from
    lineitem, with min(l_extendedprice) standing in for ps_supplycost
    and sum(l_quantity) for ps_availqty. No arithmetic on the cost
    stand-in → min/equality joins stay bit-exact across engines.
  * "late shipment" (q4/q12/q21) = l_shipdate > o_orderdate + N days,
    replacing the commitdate/receiptdate comparison.
  * q19's container predicate becomes a p_size range; q22's phone
    country code becomes c_nationkey % 5.
Each adaptation preserves the ORIGINAL query's operator structure
(correlated min, EXISTS/NOT EXISTS, disjunctive join predicates, scalar
subqueries) — that structure, not the literal predicate, is what the
coverage matrix pins.

Scale design notes (100 TB):
  * Every scalar subquery (q11 total, q15-style max, q22 avg) is a
    1-row aggregate broadcast back — never a window over everything.
  * Threshold comparisons that gate rows (q11) run on integer cents:
    double partial-sum order differs between engines/executors, and a
    float threshold at the boundary would be nondeterministic. Integer
    sums are associative → plan-shape independent.
  * The q21 self-correlation is ONE per-orderkey set aggregation (the
    supplier set and the late-supplier set collected together) — a
    single shuffle of the fact table instead of four correlated probes.
  * Dimension filters go BELOW derived-partsupp aggregates (q2, q16):
    only qualifying fact rows enter the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io.load(spark, sf_dir, name)


def _cents(col: str):
    """Exact integer cents from a 2-decimal double — order-independent sums."""
    return F.round(F.col(col) * 100, 0).cast("long")


# --- TPC-H Q2 shape: correlated min over derived partsupp -------------------

def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each qualifying part, the EUROPE supplier(s) achieving the
    per-part minimum supply cost. The correlated `= (SELECT min ...)`
    decorrelates into a per-part min aggregate joined back; cost is
    min(l_extendedprice) per (part, supplier) — no arithmetic, so the
    min-equality join is bit-exact. Both broadcast dimension filters are
    applied BELOW the (partkey, suppkey) aggregate, so only qualifying
    lineitem rows enter the shuffle (~0.4% of the fact table here;
    measured 1.7 → 1.1 s warm, 8.2 → 1.6 s cold at sf0.1). The
    supplier attributes are functionally dependent on suppkey, so
    carrying them as extra group keys costs nothing and saves the
    post-aggregate rejoin."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    lb = (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu), l.l_suppkey == F.col("s_suppkey"))
    )
    # lazy checkpoint (r10): pse feeds BOTH the per-part min aggregate
    # and the min-equality join back — without it the whole
    # lineitem⋈part⋈eu subtree is planned (and its scans run) twice
    # per action; (qualifying part, supplier)-grain rows, materialized
    # by the min aggregate's broadcast job
    pse = lb.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"),
        "s_name", "s_acctbal", "n_name",
    ).agg(F.min("l_extendedprice").alias("supply_cost")).localCheckpoint(eager=False)
    mc = pse.groupBy(F.col("partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        pse.join(F.broadcast(mc),
                 (pse.partkey == F.col("m_partkey"))
                 & (pse.supply_cost == F.col("min_cost")))
        .select("s_acctbal", "s_name", "n_name", "partkey",
                F.round("supply_cost", 2).alias("cost"))
        .orderBy(F.col("s_acctbal").desc(), "s_name", "partkey")
        .limit(100)
    )


MIN_COST_SUPPLIER_SQL = """
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pse AS (
  SELECT * FROM ps
  JOIN eu ON suppkey = s_suppkey
  JOIN part ON partkey = p_partkey
  WHERE p_size = 15 AND p_type = 'SMALL'
), mc AS (
  SELECT partkey AS m_partkey, min(supply_cost) AS min_cost
  FROM pse GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, partkey, round(supply_cost, 2) AS cost
FROM pse JOIN mc ON partkey = m_partkey AND supply_cost = min_cost
ORDER BY s_acctbal DESC, s_name, partkey
LIMIT 100
"""


# --- TPC-H Q4 shape: EXISTS semi-join ---------------------------------------

def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders-per-priority where at least one lineitem shipped late
    (shipdate > orderdate + 60 days standing in for receipt>commit).
    EXISTS = left-semi join with the lateness predicate folded into the
    join condition — one shuffle on orderkey, no duplicate inflation."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_CHECKING_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --- TPC-H Q8 shape: national market share ----------------------------------

def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of AMERICA-region PROMO-part revenue per
    year. Case-gated sum over the full volume — both sums ride the same
    single fact shuffle; every dimension hop is broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_am = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_nk"),
                                   F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("sn_nk"))
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_am), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


NATIONAL_MARKET_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1
"""


# --- TPC-H Q9 shape: product profit by nation × year ------------------------

def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: gross revenue (no ps_supplycost column exists, so profit =
    extendedprice net of discount) for parts named like '%red%', by
    supplier nation and order year. LIKE-filtered part broadcasts; the
    lineitem↔orders join is the single large exchange."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sn = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_profit"))
    )


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --- TPC-H Q11 shape: HAVING vs a scalar fraction-of-total ------------------

def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose NATION_7-supplied value exceeds 0.1% of the
    total. The threshold compare runs on integer cents (double partial-
    sum order differs between engines and executor plans; a float
    boundary would be nondeterministic — integer sums are associative).
    The 1-row total broadcasts back; no global window."""
    l = _t(spark, sf_dir, "lineitem")
    s7 = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        l.join(F.broadcast(s7), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_cents("l_extendedprice")).alias("cents"))
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(F.sum("cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("cents") * 1000 > F.col("total_cents"))
        .select("partkey", F.round(F.col("cents") / 100.0, 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


IMPORTANT_PARTS_SQL = """
WITH pp AS (
  SELECT l_partkey AS partkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1
)
SELECT partkey, round(cents / 100.0, 2) AS part_value
FROM pp
WHERE cents * 1000 > (SELECT sum(cents) FROM pp)
ORDER BY part_value DESC, partkey
"""


# --- TPC-H Q12 shape: priority CASE-counts by lateness bucket ---------------

def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: high/low-priority line counts per lateness bucket (shipmode
    column doesn't exist; LATE = shipped >30 days after order date).
    CASE-gated counts share one shuffle on the 2-value bucket key."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS"), "LATE")
            .otherwise("ONTIME"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


PRIORITY_SHIPPING_SQL = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# --- TPC-H Q16 shape: NOT IN exclusion + distinct supplier counts -----------

def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct suppliers per (brand, type, size) over the derived
    partsupp, excluding negative-balance suppliers (the `NOT IN
    (complaints)` stand-in, implemented as broadcast left-anti).

    Both filters apply below the aggregate and the intermediate
    (partkey, suppkey) DISTINCT folds into countDistinct itself — one
    shuffle of only the qualifying rows instead of a full-fact distinct
    followed by a second aggregate (measured 4.0 → 1.1 s warm at
    sf0.1, identical results)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", F.col("l_suppkey").alias("suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


PARTS_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) ps
JOIN part ON partkey = p_partkey
WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- TPC-H Q19 shape: disjunction of conjunctive join predicates ------------

def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue under an OR of three brand/size/quantity conjunctions
    (container column doesn't exist; p_size ranges stand in). The
    equi-join key (partkey) is shared by all three branches, so this
    stays ONE broadcast hash join with the disjunction as a post-join
    filter — not a union of three scans."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    c1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) \
        & F.col("l_quantity").between(1, 11)
    c2 = (F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10) \
        & F.col("l_quantity").between(10, 20)
    c3 = (F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15) \
        & F.col("l_quantity").between(20, 30)
    return j.filter(c1 | c2 | c3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


DISJUNCTIVE_REVENUE_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- TPC-H Q20 shape: nested semi-join chain --------------------------------

def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: ASIA suppliers who shipped more than 25% of a 'small%'
    part's 1997 volume (ps_availqty > 0.5*sum stand-in). Nested
    IN-subqueries become a semi-join chain; quantities are small
    integers stored as doubles, so their sums are exact and the
    fraction compare is deterministic."""
    sm = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    l97 = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        l97.join(F.broadcast(sm), l97.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum("l_quantity").alias("pair_qty"))
        .localCheckpoint(eager=False)
    )
    part_total = pair.groupBy(F.col("partkey").alias("t_partkey")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    excess = (
        pair.join(F.broadcast(part_total), pair.partkey == F.col("t_partkey"))
        .filter(F.col("pair_qty") * 4 > F.col("part_qty"))
        .select("suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(excess), F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


EXCESS_SUPPLIERS_SQL = """
WITH pair AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey, sum(l_quantity) AS pair_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), excess AS (
  SELECT DISTINCT suppkey
  FROM pair JOIN (SELECT partkey AS t_partkey, sum(pair_qty) AS part_qty
                  FROM pair GROUP BY 1) t
    ON partkey = t_partkey
  WHERE pair_qty * 4 > part_qty
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (SELECT suppkey FROM excess)
ORDER BY s_name
"""


# --- TPC-H Q21 shape: EXISTS + NOT EXISTS self-correlation ------------------

def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: suppliers who were the SOLE late shipper on a multi-supplier
    finished order (late = shipped >60 days after order date). The
    EXISTS ("another supplier on the order") / NOT EXISTS ("another
    LATE supplier") pair decorrelates into two per-orderkey distinct
    counts joined back — here collapsed further into ONE aggregation:
    per order, collect the supplier set and the late-supplier set;
    qualifying orders (≥2 suppliers, exactly 1 late) each name their
    sole late supplier directly. The fact table shuffles exactly once
    on orderkey (per-order sets are ≤7 elements, so collect_set state
    is tiny) — measured 2.3 → 1.3 s warm, 10.6 → 2.2 s cold at sf0.1
    vs the two-aggregate formulation, identical results. The
    single-element set makes element_at deterministic despite
    collect_set's unordered contract."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    ll = l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
    )
    per_order = ll.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("all_s"),
        F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_s"),
    )
    waiting = per_order.filter((F.size("all_s") >= 2) & (F.size("late_s") == 1)).select(
        F.element_at("late_s", 1).alias("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


WAITING_SUPPLIERS_SQL = """
WITH ll AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS po_ok,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
  FROM ll GROUP BY 1
)
SELECT s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM ll WHERE is_late) w
JOIN per_order ON l_orderkey = po_ok
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- TPC-H Q22 shape: scalar-subquery threshold + anti join -----------------

def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: never-ordered customers with above-average positive balance,
    grouped by a synthetic country code (c_nationkey % 5 — no phone
    column). "Dormant" = no orders since 1999 (every customer has SOME
    order at this density, so the literal no-orders-ever predicate would
    gate nothing). The global avg is a 1-row broadcast scalar; the NOT
    EXISTS is a left-anti join against the date-filtered custkeys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


DORMANT_CUSTOMERS_SQL = """
SELECT c_nationkey % 5 AS cntrycode,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY 1
"""


# --- arbitrary GROUPING SETS ------------------------------------------------

def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general form rollup/cube specialize
    ((status, priority), (status), ()) but NOT (priority): one Expand +
    single partial-aggregated pass, same as rollup_sales/cube_orders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").alias("g_st"),
            F.grouping("o_orderpriority").alias("g_pr"),
        )
    )


GROUPING_SETS_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n_orders,
       grouping(o_orderstatus) AS g_st,
       grouping(o_orderpriority) AS g_pr
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# --- referential-integrity audit --------------------------------------------

# (relationship name, child table, child key, parent table, parent key)
_FK_RELATIONSHIPS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the whole star schema: per relationship,
    child row count, NULL-key rows, and orphans (non-null keys with no
    parent) — the constraint check a warehouse runs before trusting a
    load, which the reference's MySQL schema declares nowhere (no FK
    constraints in the DDL, maillog2db.go:61-110) and Spark tables
    never enforce.

    Plan (r11 restructure, guide §2.3/§2.4/§6; tightening the r10
    relationship-tagged pass, whose after-plan still held 14 parquet
    scans — each table re-scanned once per relationship ROLE): every
    table is scanned EXACTLY ONCE, and one in-row explode emits all of
    that table's (rel, key, side) entries — lineitem's one scan feeds
    its three child keys, nation's one scan feeds its child key and
    both parent roles. Child multiplicities and the parent-hit flag
    then ride a SINGLE (rel, k) aggregation (one shuffle — the r10
    form paid a child aggregate, a parent dedup, and a join), and one
    groupBy(rel) reads rows/nulls/orphans off the per-key counts. The
    per-key groups are exactly the per-relationship groups the old
    plan built: a NULL child key forms its own group that no parent
    entry can hit (the hit flag requires a NON-NULL parent key —
    value-equivalent to the old join-on-equality, which never matched
    NULLs), and parent keys contribute 0 to every child sum, so
    duplicate parent keys stay harmless (the old dedup guard's
    contract)."""
    roles: dict[str, list] = {}
    for name, child, ck, parent, pk in _FK_RELATIONSHIPS:
        roles.setdefault(child, []).append((name, ck, True))
        roles.setdefault(parent, []).append((name, pk, False))
    streams = [
        _t(spark, sf_dir, tbl)
        .select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(rel).alias("rel"),
                        F.col(col).cast("bigint").alias("k"),
                        F.lit(is_child).alias("is_child"),
                    )
                    for rel, col, is_child in entries
                ])
            ).alias("e")
        )
        .select("e.rel", "e.k", "e.is_child")
        for tbl, entries in roles.items()
    ]
    all_keys = streams[0]
    for s in streams[1:]:
        all_keys = all_keys.unionByName(s)
    kg = all_keys.groupBy("rel", "k").agg(
        F.sum(F.when(F.col("is_child"), 1).otherwise(0)).alias("cnt"),
        F.max(
            F.when(~F.col("is_child") & F.col("k").isNotNull(), 1)
        ).alias("hit"),
    )
    counts = kg.groupBy("rel").agg(
        F.sum("cnt").cast("bigint").alias("n_child"),
        F.sum(F.when(F.col("k").isNull(), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_null_keys"),
        F.sum(
            F.when(
                F.col("k").isNotNull() & F.col("hit").isNull(),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_orphans"),
    )
    # a zero-row child table produces no (rel, k) groups, so groupBy
    # would drop its relationship row — the old per-branch global
    # aggregate (and the oracle's scalar subqueries) emit n_child = 0
    # instead. Outer-join the literal relationship list to pin that
    # contract; the 7-row literal broadcasts for free.
    rels = spark.createDataFrame(
        [(name,) for name, *_ in _FK_RELATIONSHIPS], ["rel"]
    )
    return (
        rels.join(counts, "rel", "left")
        .select(
            F.col("rel").alias("relationship"),
            F.coalesce("n_child", F.lit(0)).cast("bigint").alias("n_child"),
            F.coalesce("n_null_keys", F.lit(0)).cast("bigint").alias("n_null_keys"),
            F.coalesce("n_orphans", F.lit(0)).cast("bigint").alias("n_orphans"),
        )
    )


REFERENTIAL_INTEGRITY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relationship,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT count(*) FROM {child} WHERE {ck} IS NULL) AS n_null_keys,
       (SELECT count(*) FROM {child} c WHERE c.{ck} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphans"""
    for name, child, ck, parent, pk in _FK_RELATIONSHIPS
)


def daily_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of the order stream against the
    shipment stream by calendar day — the audit that finds days where
    one side is silent (orders placed but nothing shipped, shipments
    on days with no order intake). Completes the engine's join-type
    surface: inner/semi/anti/left/as-of/range are all exercised
    elsewhere; this is the full-outer shape, on POST-AGGREGATE daily
    tables (two map-side-combined groupBys, then a calendar-bounded
    join — never row×row)."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    j = o.join(l, "day", "full_outer")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("n_shipped", F.lit(0)).cast("bigint").alias("n_shipped"),
        F.when(F.col("n_orders").isNull(), "ship_only")
        .when(F.col("n_shipped").isNull(), "order_only")
        .otherwise("both")
        .alias("status"),
    )


DAILY_RECONCILIATION_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_shipped
  FROM lineitem GROUP BY 1
)
SELECT strftime(coalesce(o.day, l.day), '%Y-%m-%d') AS day,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_shipped, 0) AS BIGINT) AS n_shipped,
       CASE WHEN n_orders IS NULL THEN 'ship_only'
            WHEN n_shipped IS NULL THEN 'order_only'
            ELSE 'both' END AS status
FROM o FULL OUTER JOIN l USING (day)
"""


# --- ABC / Pareto classification ---------------------------------------------

ABC_A = (4, 5)    # cum share <= 4/5  (80%)
ABC_B = (19, 20)  # cum share <= 19/20 (95%)


def abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) customer classification: rank customers by total
    revenue, walk the cumulative share, and class the head that carries
    80% as A, the next 15% as B, the tail as C — the inventory/accounts
    segmentation every warehouse ships. Revenue sums in exact integer
    cents and BOTH class cuts compare integer cross-products
    (5·cum ≤ 4·total, 20·cum ≤ 19·total), so no engine ever decides a
    boundary on a float.

    Scale note: a Pareto walk is inherently a global ranking over the
    POST-AGGREGATE customer-grain table (one map-side-combined groupBy
    of the fact stream first) — but that grain is still
    data-proportional (~10⁹ customers at warehouse scale), so the rank
    and running sum go through ``windows.distributed_cumulative``:
    range-partitioned per-partition partials, driver-prefixed offsets
    broadcast back — no single-partition sort anywhere in the plan."""
    from .windows import distributed_cumulative

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("revenue_cents"))
        .localCheckpoint(eager=False)
    )
    # ONE job collects the grand total AND the customer-grain count
    # (r10): the count feeds dc's partition sizing (its internal count
    # job is skipped) and the 1-row total becomes a literal frame —
    # the previous form re-aggregated the orders fact table for
    # `total` inside the final action.
    tot_row = rev.agg(
        F.sum("revenue_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("nc"),
    ).collect()[0]
    tc = int(tot_row["total_cents"] or 0)
    ranked = distributed_cumulative(
        rev,
        [F.col("revenue_cents").desc(), F.col("o_custkey")],
        sum_cols=("revenue_cents",),
        n_rows=int(tot_row["nc"]),
    ).select(
        "o_custkey",
        "revenue_cents",
        F.col("_grank").cast("int").alias("rank"),
        F.col("_gcum_revenue_cents").alias("cum_cents"),
    )
    # the grand total is a driver literal now — inline it instead of
    # cross-joining a 1-row frame (drops the BroadcastNestedLoopJoin)
    return ranked.select(
        "o_custkey",
        "revenue_cents",
        "rank",
        F.expr(f"CAST(cum_cents * 1000000 div {tc} AS BIGINT)").alias(
            "cum_share_ppm"
        ),
        F.when(
            F.col("cum_cents") * ABC_A[1] <= F.lit(tc) * ABC_A[0], "A"
        )
        .when(F.col("cum_cents") * ABC_B[1] <= F.lit(tc) * ABC_B[0], "B")
        .otherwise("C")
        .alias("abc_class"),
    )


ABC_PARETO_SQL = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents FROM rev
), ranked AS (
  SELECT o_custkey, revenue_cents,
         CAST(row_number() OVER w AS INT) AS rank,
         CAST(sum(revenue_cents) OVER (ORDER BY revenue_cents DESC, o_custkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS BIGINT) AS cum_cents
  FROM rev
  WINDOW w AS (ORDER BY revenue_cents DESC, o_custkey)
)
SELECT o_custkey, revenue_cents, rank,
       CAST(cum_cents * 1000000 // total_cents AS BIGINT) AS cum_share_ppm,
       CASE WHEN cum_cents * {ABC_A[1]} <= total_cents * {ABC_A[0]} THEN 'A'
            WHEN cum_cents * {ABC_B[1]} <= total_cents * {ABC_B[0]} THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked CROSS JOIN tot
"""


# --- exact equi-depth histogram ----------------------------------------------

EQUIDEPTH_BUCKETS = 20


def price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth histogram of order prices: every bucket holds
    the same row count (±1), boundaries fall where the data says, not
    on a fixed grid — the profile a cost-based optimizer or a
    quantile-SLA report wants, and the exact complement of the
    t-digest approximation in the sketch family.

    Exact equi-depth needs a global rank over a DATA-PROPORTIONAL
    column — precisely the shape ``windows.distributed_cumulative``
    exists for (range-partitioned two-phase rank; an ntile window here
    would be a single task sorting every order). ``ntile_from_rank``
    then recomputes the bucket from (rank, total) in pure integer
    arithmetic — no float ever decides a boundary. Prices aggregate in
    exact cents; the (ties → o_orderkey) tiebreak makes the total
    order, and therefore every bucket edge, engine-identical."""
    from .windows import distributed_cumulative, ntile_from_rank

    o = io.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # r10: the rank input is a 1:1 projection of the orders scan, so
    # its cardinality is the parquet row count — a metadata-cheap job —
    # and the same number is the ntile total (rank passes preserve
    # cardinality), replacing dc's internal count of the projected
    # checkpoint and the n_total aggregate branch.
    nc = io.load(spark, sf_dir, "orders").count()
    g = distributed_cumulative(
        o, [F.col("cents"), F.col("o_orderkey")], n_rows=nc
    )
    # nc is a driver literal — inline it into the bucket expression
    # (no 1-row broadcast frame, no BroadcastNestedLoopJoin)
    bucketed = g.withColumn(
        "bucket", ntile_from_rank("_grank", str(nc), EQUIDEPTH_BUCKETS)
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


PRICE_EQUIDEPTH_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT cents,
         CAST(ntile({EQUIDEPTH_BUCKETS})
              OVER (ORDER BY cents, o_orderkey) AS INT) AS bucket
  FROM o
)
SELECT bucket, count(*) AS n_orders,
       min(cents) AS lo_cents, max(cents) AS hi_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM ranked GROUP BY bucket
"""
