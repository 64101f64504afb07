"""Event-stream analytics over the ``events`` table: tumbling windows,
sessionization, per-entity top-k (SURVEY §2.9 "event-stream analytics").

These are the batch duals of the streaming operators in streaming.py —
same F.window / gap-based session semantics, oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io

SESSION_GAP_MIN = 30

# distributed_cumulative: rows per range partition. ~1M-row local
# sorts are the sweet spot the two-phase crossover rehearsal measured
# (SCALING.md: single-partition wins below ~5M rows; per-task sort
# cost stays sub-second at this grain). At 10⁹ customer-grain rows
# this asks for ~1000 partitions, capped by the cluster's configured
# shuffle width.
_ROWS_PER_RANGE_PART = 1_048_576


def distributed_cumulative(
    df: DataFrame,
    order_exprs: list,
    sum_cols: tuple[str, ...] = (),
    n_parts: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Distributed global row_number + integer running sums — the
    two-phase decomposition of ``Window.orderBy(...)`` with no
    partition key, which Spark otherwise plans as ONE task sorting the
    entire input (the `WindowExec: No Partition Defined` scale-killer:
    at 100 TB a customer-grain table is ~10⁹ rows through one thread).

    Phase 1: range-partition on the order key (partition ids provably
    ascend along the sort order, including desc keys — the same
    machinery global sort uses), then per-partition row_number/cumsum
    run as ordinary partitioned windows, all partitions in parallel.
    Phase 2: per-partition row counts and value sums (≤ n_parts rows —
    bounded by the partition count, NEVER data-proportional) come back
    to the driver, exclusive prefix offsets are computed there, and a
    broadcast join adds each partition's offset to its local values.
    The local phase is materialized (localCheckpoint) so the offsets
    job and the final plan share one computation of the input lineage.

    ``order_exprs`` must define a TOTAL order (include a unique
    tiebreaker) — a tie spanning a partition boundary would otherwise
    make ranks depend on the sampled bounds. ``sum_cols`` must be
    integer-typed (the engine's fixed-point doctrine: running sums in
    exact integers, never floats). Appends ``_grank`` (1-based global
    row_number, BIGINT) and ``_gcum_<col>`` per sum column.

    Parallelism is sized from the MEASURED input (the materialized
    checkpoint makes the count a metadata-cheap job): one partition
    per ``_ROWS_PER_RANGE_PART`` rows, floored at 1 and capped at
    ``spark.sql.shuffle.partitions`` — the same size-not-guess
    decision AQE makes when it coalesces shuffle partitions. A 190k-row
    boundary table gets 1 partition (and skips the sampling and offset
    jobs outright — the offset is zero by construction); a 10⁹-row
    customer grain gets the full configured width. Ranks are
    partitioning-independent (total order), so the plan choice can
    never change a result.

    ``n_rows`` (r10): callers that already know the input cardinality
    (rank passes preserve it, so a chain of cumulative calls needs ONE
    count; fan-outs know it as n_base x fanout) pass it here and the
    internal count job is skipped entirely — the lazy input checkpoint
    then materializes inside the first downstream job instead of a
    dedicated count. Because ranks are partitioning-independent, a
    cardinality estimate here can only ever change the partition
    count, never a result value.
    """
    spark = df.sparkSession
    # Materialize the input ONCE before range partitioning:
    # repartitionByRange first runs a sampling job over the full input
    # lineage to pick range bounds, then re-runs that lineage for the
    # actual shuffle. When the upstream is expensive (sessionize's
    # window+agg feeding concurrent_sessions; the orders aggregate
    # feeding rfm/abc), that is a double computation of the dominant
    # stage. The checkpoint trades one extra materialization of the
    # (already reduced, same-scale-as-`local`) input for running the
    # upstream exactly once — the same trade `local` itself makes below.
    # LAZY (r10): the count() below is the first action and
    # materializes it inside its own job — one job instead of two.
    df = df.localCheckpoint(eager=False)
    if n_parts is None:
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cnt = n_rows if n_rows is not None else df.count()
        n_parts = min(cap, max(1, -(-cnt // _ROWS_PER_RANGE_PART)))
    if n_parts == 1:
        # Single range: no bounds to sample, offsets are identically
        # zero — run the window over one coalesced partition and skip
        # the sampling and partial-aggregate jobs entirely. _pid stays
        # spark_partition_id() (a non-foldable 0), so the window keeps
        # an explicit partition spec instead of Catalyst folding a
        # literal key into `WindowExec: No Partition Defined`.
        part = df.coalesce(1).withColumn("_pid", F.spark_partition_id())
    else:
        part = df.repartitionByRange(n_parts, *order_exprs).withColumn(
            "_pid", F.spark_partition_id()
        )
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    local = part.withColumn("_lrn", F.row_number().over(w))
    for c in sum_cols:
        local = local.withColumn(f"_lcum_{c}", F.sum(c).over(cum))
    # lazy (r10): the offsets collect (n_parts > 1) or the caller's
    # action (n_parts == 1) is the first consumer and materializes it;
    # later consumers read the same checkpointed partitions
    local = local.localCheckpoint(eager=False)

    if n_parts == 1:
        out = local.withColumn("_grank", F.col("_lrn").cast("bigint"))
        drop = ["_pid", "_lrn"]
        for c in sum_cols:
            out = out.withColumn(
                f"_gcum_{c}", F.col(f"_lcum_{c}").cast("bigint")
            )
            drop.append(f"_lcum_{c}")
        return out.drop(*drop)

    partials = sorted(
        local.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            # partition total = sum of the RAW column, not max of the
            # running sum — with negative values (sweep-line deltas)
            # the running sum's max is not its final value
            *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        )
        .collect(),
        key=lambda r: r._pid,
    )
    off_rows, off_n = [], 0
    offs = {c: 0 for c in sum_cols}
    for r in partials:
        off_rows.append((r._pid, off_n, *[offs[c] for c in sum_cols]))
        off_n += r._n
        for c in sum_cols:
            offs[c] += r[f"_s_{c}"] or 0
    schema = "_pid int, _off_n bigint" + "".join(
        f", _off_{c} bigint" for c in sum_cols
    )
    off = spark.createDataFrame(off_rows, schema)

    out = local.join(F.broadcast(off), "_pid").withColumn(
        "_grank", (F.col("_off_n") + F.col("_lrn")).cast("bigint")
    )
    drop = ["_pid", "_lrn", "_off_n"]
    for c in sum_cols:
        out = out.withColumn(
            f"_gcum_{c}",
            (F.col(f"_off_{c}") + F.col(f"_lcum_{c}")).cast("bigint"),
        )
        drop += [f"_lcum_{c}", f"_off_{c}"]
    return out.drop(*drop)


def ntile_from_rank(rank_col: str, total_col: str | int, n: int):
    """SQL ``ntile(n)`` recomputed from a global rank and total count
    in exact integer arithmetic — the companion to
    ``distributed_cumulative`` for quantile bucketing without a
    single-partition window. Standard ntile fill: the first
    ``total mod n`` buckets get ``total div n + 1`` rows, the rest get
    ``total div n`` (identical in Spark and DuckDB; integer ``div``
    never lets a float decide a bucket boundary).

    ``total_col`` is spliced into a SQL expression VERBATIM: pass a
    column name, or an int for the driver-literal total the r10 ntile
    callers inline (ADVICE r10 — ints are formatted explicitly here so
    the splice contract is visible at the signature)."""
    total = str(int(total_col)) if isinstance(total_col, int) else total_col
    q = f"({total} div {n})"
    rem = f"({total} % {n})"
    cut = f"({rem} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {cut} "
        f"THEN ({rank_col} - 1) div ({q} + 1) + 1 "
        f"ELSE {rem} + ({rank_col} - {cut} - 1) div {q} + 1 END AS INT)"
    )


def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type — F.window is the native
    streaming-compatible bucketing (epoch-aligned, identical to
    date_trunc for whole-hour widths)."""
    e = io.load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "n_users")
    )


TUMBLING_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


SLIDE_US = 15 * 60 * 1_000_000  # 15-minute slide step, microseconds
SLIDE_FACTOR = 4  # windows per event = window size / slide (1h / 15m)


def sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window SLIDING every 15 minutes per event_type — the
    overlapping-window shape tumbling_hourly/sessionize don't cover.
    ``F.window(ts, size, slide)`` assigns each event to size/slide
    epoch-aligned windows (an internal generator, no join); the
    aggregation then shuffles once on (window, event_type) exactly like
    the tumbling case, with output volume SLIDE_FACTOR× — the inherent
    cost of overlap, not a plan artifact. Streaming dual:
    streaming.streaming_tumbling_counts with slide= (same epoch-aligned
    window ids, so stream≡batch holds per closed window)."""
    e = io.load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


# the oracle expands each event to its SLIDE_FACTOR member windows
# explicitly: starts are the epoch-aligned 15-minute bucket of ts minus
# k slides, k = 0..3 — every start s satisfies s <= ts < s + 1h, exactly
# Spark's assignment. Integer-µs arithmetic (epoch_us // slide), never
# float seconds: double loses µs precision at epoch magnitudes.
SLIDING_HOURLY_SQL = f"""
WITH slid AS (
  SELECT make_timestamp((epoch_us(ts) // {SLIDE_US}) * {SLIDE_US} - k.range * {SLIDE_US})
           AS window_start,
         event_type, value, user_id
  FROM events CROSS JOIN range({SLIDE_FACTOR}) k
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM slid GROUP BY 1, 2
"""


TRAILING_DAYS = 7


def trailing_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day event stats at every event — a RANGE
    window frame (value-based bounds over the timestamp), the frame
    type rows-frames can't express: each row's window is [ts − 7d, ts]
    regardless of how many rows fall inside. One shuffle on user_id;
    Spark evaluates the sliding frame with two moving pointers over the
    sorted partition (O(n) per partition, not O(n²)). Integer-µs
    ordering keys on both engines — epoch arithmetic, never float
    seconds."""
    e = io.load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-TRAILING_DAYS * 86_400 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 6).alias("sum_7d"),
    )


TRAILING_WINDOW_STATS_SQL = f"""
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_7d,
       round(sum(value) OVER w, 6) AS sum_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {TRAILING_DAYS * 86_400 * 1_000_000} PRECEDING AND CURRENT ROW)
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the classic
    lag + cumulative-sum-of-boundaries window composition. One shuffle
    on user_id; both window functions share the same partitioning so
    Catalyst plans a single sort+window stage."""
    e = io.load_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap — second-truncated arithmetic would misplace
    # boundaries for sub-second-offset events
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
    new_session = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    sess = e.withColumn("session_seq", F.sum(new_session).over(
        by_user.rowsBetween(Window.unboundedPreceding, 0)
    ))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: how many 30-min-gap sessions are active
    at each boundary instant — the interval-overlap COUNTING shape
    (peak concurrent users is its max), distinct from the pairwise
    range join (ev_pairs_within_5min) and from gap sessionization
    itself. Each session interval [start, end] contributes +1 at start
    and −1 at end + 1 µs (closed intervals); deltas are PRE-AGGREGATED
    per boundary timestamp, so the prefix sum sees one row per distinct
    instant. The boundary table is still two rows per session —
    data-proportional — so the prefix sum runs through
    ``distributed_cumulative`` (range-partitioned partials + broadcast
    offsets), never a single-partition global window."""
    s = sessionize(spark, sf_dir)
    deltas = (
        s.select(F.col("session_start").alias("ts"), F.lit(1).alias("d"))
        .unionAll(
            s.select(
                (F.col("session_end") + F.expr("INTERVAL 1 MICROSECOND")).alias("ts"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("ts")
        .agg(F.sum("d").cast("bigint").alias("delta"))
    )
    return distributed_cumulative(
        deltas, [F.col("ts")], sum_cols=("delta",)
    ).select("ts", "delta", F.col("_gcum_delta").alias("depth"))


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_MIN * 60 * 1000000}
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  -- CAST: DuckDB sum(int) widens to HUGEINT (→ float in pandas)
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM numbered GROUP BY user_id, session_seq
"""


CONCURRENT_SESSIONS_SQL = f"""
WITH sess AS ({SESSIONIZE_SQL}),
deltas AS (
  SELECT ts, CAST(sum(d) AS BIGINT) AS delta FROM (
    SELECT session_start AS ts, 1 AS d FROM sess
    UNION ALL
    SELECT session_end + INTERVAL 1 MICROSECOND AS ts, -1 AS d FROM sess
  ) GROUP BY ts
)
SELECT ts, delta,
       CAST(sum(delta) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS depth
FROM deltas
"""


def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by aggregate — agg then takeOrdered-style
    sort+limit (AQE collapses this to a single-partition top-k,
    no full sort of the aggregate output)."""
    e = io.load_events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


TOP_USERS_SQL = """
SELECT user_id, round(sum(value), 6) AS total_value, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
"""


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type distinct users + running cumulative events — mixes
    grouped distinct aggregation with an ordered analytic window."""
    e = io.load_events(spark, sf_dir)
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("dau"), F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn("cum_events", F.sum("n_events").over(w))


DAILY_ACTIVE_USERS_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         count(DISTINCT user_id) AS dau, count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, dau, n_events,
       CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events
FROM daily
"""


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline analytics: gap to previous order
    (lag), 3-order moving average of spend, and per-customer sequence
    rank — all three window functions share one (custkey) partitioning
    so Catalyst plans a single sort+window stage (one shuffle)."""
    o = io.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("order_seq"),
        F.datediff(F.col("o_orderdate"), prev_date).alias("days_since_prev"),
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4
        ).alias("moving_avg_3"),
    )


CUSTOMER_ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT)
         AS days_since_prev,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


FUNNEL_STEP_HOURS = 24


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged funnel: first view → first click within 24 h of it →
    first purchase within 24 h of that, per user. The inherently
    sequential stage dependency becomes a chain of per-user min
    aggregates, each broadcast back into the (filtered) event scan —
    the fact table never shuffles: each stage shuffles only its own
    event type's rows on user_id, and user-grain stage timestamps are
    broadcast-sized by construction (≤ one row per user)."""
    e = io.load_events(spark, sf_dir)
    step = F.expr(f"INTERVAL {FUNNEL_STEP_HOURS} HOURS")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + step))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + step))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    )


FUNNEL_CONVERSION_SQL = f"""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t_view
    AND ts <= t_view + INTERVAL {FUNNEL_STEP_HOURS} HOUR
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t_click
    AND ts <= t_click + INTERVAL {FUNNEL_STEP_HOURS} HOUR
  GROUP BY 1
)
SELECT v.user_id, t_view, t_click, t_purchase
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
ORDER BY user_id
"""


def user_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series feature extraction per user: gap-filled daily counts
    (dense date spine via sequence+explode — missing days ARE zeros,
    which changes the statistics, so interpolation is part of the
    operator) → lag-1 Pearson autocorrelation + dispersion.

    Scale notes: the date spine explodes from a 2-column per-user span
    (no shuffle), the spine⋈daily join and the window share the same
    user_id partitioning, and the statistics come from EXACT-INTEGER
    moment sums (daily counts are integers, so every Σx/Σxy/Σx² is a
    bigint both engines agree on bit-for-bit) with ONE float
    division/sqrt at the end over identical operands. The builtin
    corr()/stddev_samp() aggregates were the engine's one measured
    sf0.1 hash divergence: they fold float moments in partition order,
    and at 10× the gate corpus a value landed on a 6th-decimal
    rounding boundary (green at sf0.01, caught by the sf0.1 sweep).
    Zero-variance series come out NULL via nullif on both sides."""
    e = io.load_events(spark, sf_dir)
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dense = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = (
        dense.join(daily, ["user_id", "day"], "left")
        .select("user_id", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = filled.select("user_id", "n", F.lag("n").over(w).alias("prev"))
    mom = (
        lagged.filter(F.col("prev").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n").alias("sx"),
            F.sum("prev").alias("sy"),
            F.sum(F.col("n") * F.col("prev")).alias("sxy"),
            F.sum(F.col("n") * F.col("n")).alias("sxx"),
            F.sum(F.col("prev") * F.col("prev")).alias("syy"),
        )
    )
    # floor fixed-point, NOT builtin round(,6): Spark's round() goes
    # through BigDecimal's shortest-decimal string while DuckDB rounds
    # the binary double — a value landing on a 6th-decimal boundary
    # flips the hash (the value_mad_anomaly divergence class). floor
    # over the identical IEEE product is bit-equal on both engines.
    return mom.select(
        "user_id",
        F.expr(
            "floor(CAST(cnt * sxy - sx * sy AS DOUBLE)"
            " / nullif(sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE))"
            "          * sqrt(CAST(cnt * syy - sy * sy AS DOUBLE)), 0.0)"
            " * 1000000 + 0.5) / 1e6"
        ).alias("lag1_corr"),
        F.expr(
            "floor(sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE)"
            "           / nullif(cnt * (cnt - 1), 0)) * 1000000 + 0.5) / 1e6"
        ).alias("sd"),
        F.col("cnt").alias("n_days"),
    ).orderBy("user_id")


USER_DAILY_AUTOCORR_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), dense AS (
  SELECT s.user_id, unnest(range(d0, d1 + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS day
  FROM span s
), filled AS (
  SELECT d.user_id, d.day, COALESCE(n, 0) AS n
  FROM dense d LEFT JOIN daily USING (user_id, day)
), lagged AS (
  SELECT user_id, n, lag(n) OVER (PARTITION BY user_id ORDER BY day) AS prev
  FROM filled
), mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
         sum(n) AS sx, sum(prev) AS sy,
         sum(n * prev) AS sxy, sum(n * n) AS sxx, sum(prev * prev) AS syy
  FROM lagged WHERE prev IS NOT NULL
  GROUP BY 1
)
SELECT user_id,
       floor(CAST(cnt * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(cnt * syy - sy * sy AS DOUBLE)), 0.0)
             * 1000000 + 0.5) / 1e6
         AS lag1_corr,
       floor(sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE)
                  / nullif(cnt * (cnt - 1), 0)) * 1000000 + 0.5) / 1e6 AS sd,
       cnt AS n_days
FROM mom ORDER BY 1
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted
    distinct per weeks-since-cohort offset — the standard product-
    analytics retention triangle.

    Plan at scale: user first-seen is one user_id-keyed aggregate
    (map-side combined); the (user, active-day) set is a distinct over
    the same key, so AQE reuses the exchange partitioning for the
    join — the user dimension is NOT broadcast (at 100 TB the user
    table is itself huge; this is the shuffle-join case). The final
    (cohort, offset) aggregate is tiny."""
    e = io.load_events(spark, sf_dir)
    cohort = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_dt")
    )
    active = e.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_dt",
            (F.datediff("week", "cohort_dt") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_dt", "week_offset")
        # (user_id, week) is distinct upstream, so count(*) IS the
        # distinct-user count — no second distinct pass
        .agg(F.count(F.lit(1)).alias("n_users"))
        # dates round-trip differently through pandas in the two
        # engines; emit the ISO string so the oracle hash is stable
        .select(
            F.date_format("cohort_dt", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


RETENTION_COHORTS_SQL = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_dt
  FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT strftime(c.cohort_dt, '%Y-%m-%d') AS cohort_week,
       CAST((week - cohort_dt) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


# --- Markov transition matrix over sessionized event streams ----------------


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types WITHIN a
    session: for each ordered in-session event pair (prev → next),
    the transition count and row-normalized probability. The classic
    behavioral-sequence model behind next-action prediction and
    anomaly scoring ("a checkout following nothing is suspicious").

    Session scoping reuses the 30-min inactivity gap (SESSION_GAP_MIN):
    a transition only counts when the gap to the predecessor is within
    the session threshold, so cross-session pairs never pollute the
    matrix — same boundary rule as sessionize(), without needing the
    session numbering (lag + gap predicate suffices).

    Plan/scale: ONE shuffle on user_id for the lag window (events for
    one user sort together — the same partitioning every other
    per-user window op here uses), then a map-side-combined groupBy on
    the (prev, next) pair whose cardinality is |types|² (~tiny), then a
    window over prev_type rows for row normalization — post-aggregate,
    so the normalization runs on dozens of rows no matter the input
    size. Probabilities are exact-int divisions (IEEE-correctly-rounded
    on both engines), rounded to 9 to match the oracle's comparison
    grid."""
    e = io.load_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
    pairs = (
        e.select(
            F.lag("event_type").over(by_user).alias("prev_type"),
            F.col("event_type"),
            gap_us.alias("gap_us"),
        )
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("gap_us") <= SESSION_GAP_MIN * 60 * 1_000_000)
        )
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    by_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(by_prev), 9).alias("p"),
    )


MARKOV_TRANSITIONS_SQL = f"""
WITH lagged AS (
  SELECT lag(event_type) OVER w AS prev_type,
         event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pairs AS (
  SELECT prev_type, event_type FROM lagged
  WHERE prev_type IS NOT NULL AND gap_us <= {SESSION_GAP_MIN * 60 * 1000000}
), counts AS (
  SELECT prev_type, event_type, count(*) AS n FROM pairs GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       round(CAST(n AS DOUBLE) /
             CAST(CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS DOUBLE), 9) AS p
FROM counts
"""


# --- automation / bot detection over inter-event gaps ------------------------

BOT_MIN_GAPS = 5          # users with fewer gaps are never flagged
BOT_CV2_PPM = 100_000     # squared coefficient of variation <= 0.1
BOT_FAST_PPM = 900_000    # >= 90% of gaps under the fast threshold
BOT_FAST_GAP_S = 2


def bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automation/bot detection over inter-event timing — the standard
    traffic-cleaning filter a web-scale training-data pipeline runs
    before treating event streams (or crawled content keyed to them)
    as human signal: humans arrive with irregular gaps, schedulers and
    scrapers with metronomic or bursty ones. Per user: gap count,
    mean gap, the squared coefficient of variation of gaps (CV² —
    near 0 = metronomic), the share of sub-{BOT_FAST_GAP_S}s gaps
    (burstiness), and the flag
    ``n_gaps >= {BOT_MIN_GAPS} AND (CV² <= 0.1 OR fast-share >= 0.9)``.

    Determinism: gaps are integer SECONDS (µs diff div 1e6 — the
    second grain keeps Σgap² inside bigint for multi-year spans), CV²
    is the exact-integer identity (n·Σg² − (Σg)²) over (Σg)², scaled
    to ppm with the div-before-divide trick (the zipf_fit idiom), and
    every output column is a bigint or bool.

    Plan shape: ONE user-keyed shuffle — the lag window and the
    groupBy share the user_id hash partitioning, so Spark reuses the
    exchange; aggregates are map-side-combined. Nothing downstream of
    the per-user rollup is data-proportional."""
    e = io.load_events(spark, sf_dir)
    gaps = e.select(
        "user_id",
        F.expr(
            "CAST((unix_micros(ts) - lag(unix_micros(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)) div 1000000"
            " AS BIGINT)"
        ).alias("gap_s"),
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_s").alias("n_gaps"),
        F.sum("gap_s").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sgg"),
        F.sum(
            F.when(F.col("gap_s") < BOT_FAST_GAP_S, 1).otherwise(0)
        ).alias("n_fast"),
    )
    return bot_score_from(agg)


def bot_score_from(agg: DataFrame) -> DataFrame:
    """The scoring/flag math from a per-user gap-moment table
    (user_id, n_events, n_gaps, sg, sgg, n_fast) — shared by the batch
    operator above and the streaming gap store (streaming_bot.py):
    the moments are mergeable (within-batch partials + boundary gaps
    between time-consecutive batches), so both paths score through
    this one expression set.

    CV² branches on sg² >= 1e6: the div-before-divide denominator
    (sg² div 1e6) truncates to 0 whenever a user's TOTAL gap time is
    under ~1000 s, which made cv2_ppm (and is_bot) NULL — a perfectly
    metronomic user with >=5 short gaps escaped the flag. The small-sg
    branch scales the NUMERATOR instead: with sg < 1000, sgg <
    sg·max_gap < 1e6, so (n·sgg − sg²)·1e6 <= n·1e12 stays exact in
    bigint to ~9e6 gaps inside one 1000-second span (document-level
    bound, unreachable at second grain). sg = 0 (all gaps zero — the
    most metronomic signal possible) still yields NULL on both
    engines: CV² of an all-zero gap series is 0/0; such users are
    flagged through fast_ppm = 1e6 instead."""
    scored = agg.select(
        "user_id",
        "n_events",
        "n_gaps",
        F.expr("sg div nullif(n_gaps, 0)").cast("bigint").alias("mean_gap_s"),
        F.expr(
            "CASE WHEN sg * sg >= 1000000"
            " THEN (n_gaps * sgg - sg * sg) div ((sg * sg) div 1000000)"
            " ELSE (n_gaps * sgg - sg * sg) * 1000000"
            "      div nullif(sg * sg, 0) END"
        ).cast("bigint").alias("cv2_ppm"),
        F.expr("n_fast * 1000000 div nullif(n_gaps, 0)")
        .cast("bigint")
        .alias("fast_ppm"),
    )
    return scored.withColumn(
        "is_bot",
        (F.col("n_gaps") >= BOT_MIN_GAPS)
        & (
            (F.col("cv2_ppm") <= BOT_CV2_PPM)
            | (F.col("fast_ppm") >= BOT_FAST_PPM)
        ),
    )


BOT_SCORE_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000
              AS BIGINT) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap_s) AS BIGINT) AS n_gaps,
         sum(gap_s) AS sg,
         sum(gap_s * gap_s) AS sgg,
         CAST(sum(CASE WHEN gap_s < {BOT_FAST_GAP_S} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fast
  FROM gaps GROUP BY 1
), scored AS (
  SELECT user_id, n_events, n_gaps,
         CAST(sg // nullif(n_gaps, 0) AS BIGINT) AS mean_gap_s,
         CAST(CASE WHEN sg * sg >= 1000000
                   THEN (n_gaps * sgg - sg * sg) // ((sg * sg) // 1000000)
                   ELSE (n_gaps * sgg - sg * sg) * 1000000
                        // nullif(sg * sg, 0) END AS BIGINT) AS cv2_ppm,
         CAST(n_fast * 1000000 // nullif(n_gaps, 0) AS BIGINT) AS fast_ppm
  FROM agg
)
SELECT user_id, n_events, n_gaps, mean_gap_s, cv2_ppm, fast_ppm,
       (n_gaps >= {BOT_MIN_GAPS}
        AND (cv2_ppm <= {BOT_CV2_PPM} OR fast_ppm >= {BOT_FAST_PPM}))
         AS is_bot
FROM scored
"""


# --- CUSUM changepoint detection over the daily event rate -------------------

CUSUM_K_DIV = 10   # slack k = mean/10 (ppm), the drift allowance
CUSUM_H_MULT = 3   # decision threshold h = 3 * mean (ppm)


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) over the
    daily event-count series — the rate-shift monitor a pipeline runs
    over its ingest volume (a sustained upshift = a new source or a
    runaway producer; a downshift = a dying feed), catching small
    persistent shifts a per-day 3-sigma test misses.

    The textbook recursion ``S_d = max(0, S_{d-1} + y_d)`` is not a
    plain window — but its closed form IS:
    ``S_d = P_d - min(0, min_{j<=d} P_j)`` with ``P`` the running sum
    of ``y`` — so both CUSUM sides are two cumulative windows (cumsum
    + prefix-min) over the POST-AGGREGATE daily grid, bounded by the
    date span (the EWMA/vocab-growth exemption class). Everything is
    exact integer ppm: deviations ``y = n_d*1e6 - mean_ppm -/+ k_ppm``
    against a PHASE-I reference mean — the earliest quarter of days,
    the textbook in-control training window (a global mean would let
    a late shift contaminate its own baseline and halve the signal) —
    with slack k = mean/10 and threshold h = 3*mean, so the flags are
    deterministic integers on both engines.

    Scale shape: one map-side-combined groupBy(day) over the events
    scan; the reference mean and the CUSUM windows all run on
    <= date-span rows."""
    e = io.load_events(spark, sf_dir)
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return cusum_from_daily(daily)


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """The CUSUM math from a (day, n_events) table — shared by the
    batch operator above and the streaming daily-count store
    (streaming_cusum.py): daily counts are additive across batches,
    so the identical fit resolves from accumulated partials."""
    rk = Window.orderBy("day")
    ranked = daily.select(
        "day", "n_events", F.row_number().over(rk).alias("rk")
    )
    stats = (
        ranked.crossJoin(
            F.broadcast(daily.agg(F.expr("(count(*) + 3) div 4").alias("m")))
        )
        .filter(F.col("rk") <= F.col("m"))
        .agg(
            F.expr(
                "CAST(sum(n_events) * 1000000 div count(*) AS BIGINT)"
            ).alias("mean_ppm")
        )
    )
    daily = ranked.drop("rk")
    grid = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_events",
        "mean_ppm",
        F.expr(f"mean_ppm div {CUSUM_K_DIV}").alias("k_ppm"),
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = grid.select(
        "day",
        "n_events",
        "mean_ppm",
        F.sum(
            F.expr("n_events * 1000000 - mean_ppm - k_ppm")
        ).over(cum).alias("p_hi"),
        F.sum(
            F.expr("n_events * 1000000 - mean_ppm + k_ppm")
        ).over(cum).alias("p_lo"),
    )
    s = p.select(
        "day",
        "n_events",
        "mean_ppm",
        (
            F.col("p_hi")
            - F.least(F.lit(0).cast("bigint"), F.min("p_hi").over(cum))
        ).cast("bigint").alias("cusum_hi_ppm"),
        (
            -(
                F.col("p_lo")
                - F.greatest(F.lit(0).cast("bigint"), F.max("p_lo").over(cum))
            )
        ).cast("bigint").alias("cusum_lo_ppm"),
    )
    return s.select(
        "day",
        "n_events",
        "cusum_hi_ppm",
        "cusum_lo_ppm",
        (F.col("cusum_hi_ppm") > CUSUM_H_MULT * F.col("mean_ppm")).alias(
            "shift_up"
        ),
        (F.col("cusum_lo_ppm") > CUSUM_H_MULT * F.col("mean_ppm")).alias(
            "shift_down"
        ),
    )


CUSUM_CHANGEPOINT_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), ranked AS (
  SELECT day, n_events, row_number() OVER (ORDER BY day) AS rk,
         count(*) OVER () AS n_days
  FROM daily
), stats AS (
  SELECT CAST(sum(n_events) * 1000000 // count(*) AS BIGINT) AS mean_ppm
  FROM ranked WHERE rk <= (n_days + 3) // 4
), grid AS (
  SELECT day, n_events, mean_ppm,
         mean_ppm // {CUSUM_K_DIV} AS k_ppm
  FROM daily CROSS JOIN stats
), p AS (
  SELECT day, n_events, mean_ppm,
         sum(n_events * 1000000 - mean_ppm - k_ppm) OVER cum AS p_hi,
         sum(n_events * 1000000 - mean_ppm + k_ppm) OVER cum AS p_lo
  FROM grid
  WINDOW cum AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), s AS (
  SELECT day, n_events, mean_ppm,
         CAST(p_hi - least(CAST(0 AS BIGINT), min(p_hi) OVER cum)
              AS BIGINT) AS cusum_hi_ppm,
         CAST(-(p_lo - greatest(CAST(0 AS BIGINT), max(p_lo) OVER cum))
              AS BIGINT) AS cusum_lo_ppm
  FROM p
  WINDOW cum AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
)
SELECT day, n_events, cusum_hi_ppm, cusum_lo_ppm,
       cusum_hi_ppm > {CUSUM_H_MULT} * mean_ppm AS shift_up,
       cusum_lo_ppm > {CUSUM_H_MULT} * mean_ppm AS shift_down
FROM s
"""


# --- exponentially-weighted daily revenue (truncated EWMA) ------------------

EWMA_ALPHA = 0.2
EWMA_SPAN_DAYS = 27  # trailing frame: weights below (1-α)^27 ≈ 0.002 truncate


def revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing daily revenue — the smoothing/
    nowcast primitive (anomaly baselines, demand curves). The exact
    EWMA recursion is inherently sequential; the standard distributed
    form truncates it to a value-bounded RANGE frame: weights decay by
    ACTUAL day gap (missing days weigh in absently, not shifted), and
    beyond 27 days the weight is <0.2% — below the output rounding.

    Numerics discipline: revenue is summed as exact cents (bigint)
    BEFORE any float enters; the per-day fold walks the frame in
    ascending-day order on both engines (array_sort here, frame order
    in the oracle), so the only float divergence surface is pow/fold
    rounding — absorbed by the 1e-6 output grid.

    Scale shape: the windowed fold runs over the POST-AGGREGATE daily
    table (one row per day — thousands of rows at any corpus size),
    after one map-side-combined groupBy of orders. The unpartitioned
    window is bounded by the calendar, not the data — same upgrade
    note as the sweep-line query."""
    o = io.load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents")
        )
        .withColumn("d", F.datediff(F.col("day"), F.lit("1995-01-01").cast("date")))
    )
    frame = Window.orderBy("d").rangeBetween(-EWMA_SPAN_DAYS, 0)
    hist = F.collect_list(F.struct("d", "rev_cents")).over(frame)
    fold = F.aggregate(
        F.array_sort(hist),
        F.lit(0.0),
        lambda acc, x: acc
        + x["rev_cents"].cast("double")
        * F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("d") - x["d"]),
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("rev_cents") / 100.0).alias("revenue"),
        F.round(F.lit(EWMA_ALPHA) * fold / 100.0, 6).alias("ewma"),
    )


REVENUE_EWMA_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
), framed AS (
  SELECT day, d, rev_cents,
         list(struct_pack(d := d, rc := rev_cents))
           OVER (ORDER BY d RANGE BETWEEN {EWMA_SPAN_DAYS} PRECEDING AND CURRENT ROW) AS hist
  FROM daily
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       round({EWMA_ALPHA} * list_sum(list_transform(hist,
             x -> CAST(x.rc AS DOUBLE) * pow({1.0 - EWMA_ALPHA}, d - x.d))) / 100.0, 6) AS ewma
FROM framed
"""


# --- gaps-and-islands run collapse (SCD2 builder) ----------------------------


def priority_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each customer's order timeline into runs of consecutive
    same-priority orders — the gaps-and-islands pattern, which is
    exactly how a slowly-changing-dimension (SCD type 2) history table
    is built from an event stream: one row per regime with
    valid_from/valid_to observation bounds, n_orders support, and a
    per-customer regime ordinal.

    Plan shape: change-flag (lag ≠ current) + running sum over ONE
    (custkey)-partitioned, (date, orderkey)-ordered window — every
    window function shares the single sort, so the whole collapse is
    one shuffle + one sort regardless of how many regimes a customer
    has; the island aggregate and the ordinal rank then reuse the
    same custkey clustering. At 100 TB this is the shape CDC/SCD
    merges want: nothing is quadratic in history length and no
    full-table state is held — compare the reference's row-at-a-time
    freshness UPDATE (maillog2db.go:308-330), which walks entities
    one SQL round trip per line."""
    o = io.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    flag = F.when(prev.isNull() | (prev != F.col("o_orderpriority")), 1).otherwise(0)
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    g = seq.groupBy("o_custkey", "o_orderpriority", "island").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("valid_to"),
    )
    return g.select(
        "o_custkey",
        F.col("island").cast("int").alias("regime_seq"),
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        "valid_to",
        "n_orders",
    )


PRIORITY_ISLANDS_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                OR lag(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), seq AS (
  SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
  FROM flagged
)
SELECT o_custkey,
       CAST(island AS INT) AS regime_seq,
       o_orderpriority AS priority,
       strftime(min(o_orderdate), '%Y-%m-%d') AS valid_from,
       strftime(max(o_orderdate), '%Y-%m-%d') AS valid_to,
       CAST(count(*) AS BIGINT) AS n_orders
FROM seq
GROUP BY o_custkey, o_orderpriority, island
"""


# --- cohort lifetime value ---------------------------------------------------


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, each
    cohort's revenue tracked by months-since-acquisition, with the
    running cumulative and the per-customer LTV at every age — the
    curve a growth team reads cohort health from (the orders-side
    companion to `retention_cohorts`' event-side retention).

    Exactness: month arithmetic is integer (y·12+m differences, never
    date floats), revenue is integer cents, LTV is integer division of
    exact sums. Plan shape: one groupBy for cohorts (broadcast-or-
    shuffle joined back), one (cohort, age) aggregate with map-side
    combine, one cohort-partitioned cumsum window over the tiny
    post-aggregate curve table."""
    o = io.load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
    )
    first = o.groupBy("o_custkey").agg(F.min("midx").alias("cohort_idx"))
    sizes = first.groupBy("cohort_idx").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    g = (
        o.join(first, "o_custkey")
        .groupBy("cohort_idx", (F.col("midx") - F.col("cohort_idx")).alias("months_since"))
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    w = Window.partitionBy("cohort_idx").orderBy("months_since")
    curve = g.withColumn(
        "cum_revenue_cents",
        F.sum("revenue_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).join(sizes, "cohort_idx")
    return curve.select(
        F.concat_ws(
            "-",
            F.expr("CAST((cohort_idx - 1) div 12 AS STRING)"),
            F.lpad(F.expr("CAST(((cohort_idx - 1) % 12) + 1 AS STRING)"), 2, "0"),
        ).alias("cohort_month"),
        F.col("months_since").cast("int").alias("months_since"),
        "n_active",
        "revenue_cents",
        "cum_revenue_cents",
        "cohort_size",
        F.expr("cum_revenue_cents div cohort_size").alias("ltv_cents_per_customer"),
    )


COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx
  FROM orders
), first AS (
  SELECT o_custkey, min(midx) AS cohort_idx FROM o GROUP BY o_custkey
), sizes AS (
  SELECT cohort_idx, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_idx
), g AS (
  SELECT f.cohort_idx, o.midx - f.cohort_idx AS months_since,
         CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
         CAST(sum(o.cents) AS BIGINT) AS revenue_cents
  FROM o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
), curve AS (
  SELECT *,
         CAST(sum(revenue_cents) OVER (PARTITION BY cohort_idx
                                       ORDER BY months_since
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS BIGINT)
           AS cum_revenue_cents
  FROM g
)
SELECT CAST((cohort_idx - 1) // 12 AS VARCHAR) || '-' ||
         lpad(CAST(((cohort_idx - 1) % 12) + 1 AS VARCHAR), 2, '0') AS cohort_month,
       CAST(months_since AS INT) AS months_since,
       n_active, revenue_cents, cum_revenue_cents, cohort_size,
       CAST(cum_revenue_cents // cohort_size AS BIGINT) AS ltv_cents_per_customer
FROM curve JOIN sizes USING (cohort_idx)
"""


# --- funnel stage latency ----------------------------------------------------


def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles for the view→click→purchase funnel:
    per user, first view, first click at-or-after it, first purchase
    at-or-after that click; then one corpus-level row of stage counts
    and p50/p90/max latencies per transition — the question "WHERE do
    users stall, and for how long" that `funnel_conversion`'s counts
    alone can't answer.

    Determinism: stage times are integer epoch-micros mins; gaps are
    exact integer micros; the interpolated percentiles round to 1e-4
    seconds (the `ml_relay_latency` discipline). Plan shape: three
    stage aggregates each keyed on user (the later ones join the
    earlier frontier and filter before aggregating — no window over
    the event stream), then a single-row reduce."""
    e = io.load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    fv = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("fv")
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("us") >= F.col("fv"))
        .groupBy("user_id", "fv")
        .agg(F.min("us").alias("fc"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("us") >= F.col("fc"))
        .groupBy("user_id", "fv", "fc")
        .agg(F.min("us").alias("fp"))
    )
    full = fv.join(fc.select("user_id", "fc"), "user_id", "left").join(
        fp.select("user_id", "fp"), "user_id", "left"
    )
    sec = lambda col: F.col(col) / F.lit(1_000_000.0)
    pct = lambda expr, q, name: F.round(
        F.expr(f"percentile({expr}, {q})"), 4
    ).alias(name)
    return full.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("fc").alias("n_clicked"),
        F.count("fp").alias("n_purchased"),
        pct("(fc - fv) / 1000000.0", 0.5, "p50_view_to_click_sec"),
        pct("(fc - fv) / 1000000.0", 0.9, "p90_view_to_click_sec"),
        F.round(F.max(sec("fc") - sec("fv")), 4).alias("max_view_to_click_sec"),
        pct("(fp - fc) / 1000000.0", 0.5, "p50_click_to_purchase_sec"),
        pct("(fp - fc) / 1000000.0", 0.9, "p90_click_to_purchase_sec"),
        F.round(F.max(sec("fp") - sec("fc")), 4).alias("max_click_to_purchase_sec"),
    )


FUNNEL_LATENCY_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), fv AS (
  SELECT user_id, min(us) AS fv FROM e WHERE event_type = 'view' GROUP BY 1
), fc AS (
  SELECT e.user_id, fv, min(us) AS fc
  FROM e JOIN fv USING (user_id)
  WHERE event_type = 'click' AND us >= fv
  GROUP BY 1, 2
), fp AS (
  SELECT e.user_id, fc.fv, fc.fc, min(us) AS fp
  FROM e JOIN fc USING (user_id)
  WHERE event_type = 'purchase' AND us >= fc.fc
  GROUP BY 1, 2, 3
), funnel AS (
  SELECT fv.user_id, fv.fv, fc.fc, fp.fp
  FROM fv LEFT JOIN fc USING (user_id) LEFT JOIN fp USING (user_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_viewed,
       CAST(count(fc) AS BIGINT) AS n_clicked,
       CAST(count(fp) AS BIGINT) AS n_purchased,
       round(quantile_cont((fc - fv) / 1000000.0, 0.5), 4) AS p50_view_to_click_sec,
       round(quantile_cont((fc - fv) / 1000000.0, 0.9), 4) AS p90_view_to_click_sec,
       round(max(fc / 1000000.0 - fv / 1000000.0), 4) AS max_view_to_click_sec,
       round(quantile_cont((fp - fc) / 1000000.0, 0.5), 4) AS p50_click_to_purchase_sec,
       round(quantile_cont((fp - fc) / 1000000.0, 0.9), 4) AS p90_click_to_purchase_sec,
       round(max(fp / 1000000.0 - fc / 1000000.0), 4) AS max_click_to_purchase_sec
FROM funnel
"""


# --- Holt double-exponential smoothing ---------------------------------------

HOLT_ALPHA = 0.5  # level gain (exact binary fraction)
HOLT_BETA = 0.3   # trend gain
# literals shared verbatim with the oracle SQL (repr round-trips the
# exact double; computing 1-β on one side and writing 0.7 on the other
# would risk a ULP split if the subtraction didn't land on the literal)
_H_A, _H_1MA = repr(HOLT_ALPHA), repr(1.0 - HOLT_ALPHA)
_H_B, _H_1MB = repr(HOLT_BETA), repr(1.0 - HOLT_BETA)


def revenue_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over monthly revenue: the
    trend-aware upgrade of the EWMA nowcast (level AND trend state, so
    the one-step-ahead fit follows a drifting series instead of
    lagging it). fitted(t) = level(t−1)+trend(t−1) is the honest
    one-step forecast each month; level/trend update by the standard
    recursion l←α·y+(1−α)(l+b), b←β(l−l_prev)+(1−β)b, initialized
    level=first month, trend=0.

    The recursion is inherently sequential, so it runs as ONE ordered
    fold over the POST-AGGREGATE monthly table — bounded by the
    calendar (≤ date-span months at any corpus size; same
    bounded-input exemption as the EWMA's RANGE frame). The corpus-
    scale work is one map-side-combined groupBy to cents-exact monthly
    totals; the fold itself is array arithmetic on ≤ ~10² elements.

    Determinism: revenue aggregates as exact cents BEFORE any float;
    the fold walks months in ascending order on both engines (here an
    array_sort'ed fold, in the oracle a recursive CTE joined on the
    month index) with literally identical double expressions; outputs
    quantize on the ppm grid (floor(x·1e6+0.5) — sign-safe half-up,
    identical both engines, unlike engine-native round())."""
    o = io.load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents")
    )
    return holt_from_monthly(monthly)


def holt_from_monthly(monthly: DataFrame) -> DataFrame:
    """The Holt fold over any (month: string, rev_cents: bigint) table
    — shared by the batch operator above and the streaming dual
    (streaming_holt.py), so stream≡batch equivalence is equality of
    inputs, not of two fold implementations."""
    series = monthly.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "month",
                    F.col("rev_cents").alias("rc"),
                    (F.col("rev_cents").cast("double") / 100.0).alias("rev"),
                )
            )
        ).alias("s")
    )
    out_t = (
        "array<struct<month:string,rc:bigint,fitted:double,"
        "level:double,trend:double>>"
    )
    fold = f"""
    aggregate(
      s,
      named_struct('first', true, 'level', 0.0D, 'trend', 0.0D,
                   'outs', CAST(array() AS {out_t})),
      (acc, x) -> CASE WHEN acc.first THEN named_struct(
          'first', false, 'level', x.rev, 'trend', 0.0D,
          'outs', array_append(acc.outs, named_struct(
            'month', x.month, 'rc', x.rc, 'fitted', CAST(NULL AS DOUBLE),
            'level', x.rev, 'trend', 0.0D)))
        ELSE named_struct(
          'first', false,
          'level', {_H_A} * x.rev + {_H_1MA} * (acc.level + acc.trend),
          'trend', {_H_B} * (({_H_A} * x.rev + {_H_1MA} * (acc.level + acc.trend))
                             - acc.level) + {_H_1MB} * acc.trend,
          'outs', array_append(acc.outs, named_struct(
            'month', x.month, 'rc', x.rc,
            'fitted', acc.level + acc.trend,
            'level', {_H_A} * x.rev + {_H_1MA} * (acc.level + acc.trend),
            'trend', {_H_B} * (({_H_A} * x.rev + {_H_1MA} * (acc.level + acc.trend))
                               - acc.level) + {_H_1MB} * acc.trend)))
        END,
      acc -> acc.outs
    )
    """
    ppm = (
        lambda c: F.when(
            F.col(c).isNotNull(),
            F.floor(F.col(c) * 1_000_000 + 0.5).cast("bigint"),
        ).alias(f"{c}_ppm")
    )
    return (
        series.select(F.explode(F.expr(fold)).alias("r"))
        .select("r.*")
        .select(
            "month",
            F.col("rc").alias("rev_cents"),
            ppm("fitted"),
            ppm("level"),
            ppm("trend"),
        )
    )


REVENUE_HOLT_SQL = f"""
WITH RECURSIVE monthly AS (
  SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
), idx AS (
  SELECT month, rev_cents, CAST(rev_cents AS DOUBLE) / 100.0 AS rev,
         row_number() OVER (ORDER BY month) AS i
  FROM monthly
), rec AS (
  SELECT i, month, rev_cents, rev,
         rev AS level, CAST(0.0 AS DOUBLE) AS trend,
         CAST(NULL AS DOUBLE) AS fitted
  FROM idx WHERE i = 1
  UNION ALL
  SELECT m.i, m.month, m.rev_cents, m.rev,
         {_H_A} * m.rev + {_H_1MA} * (r.level + r.trend) AS level,
         {_H_B} * (({_H_A} * m.rev + {_H_1MA} * (r.level + r.trend))
                   - r.level) + {_H_1MB} * r.trend AS trend,
         r.level + r.trend AS fitted
  FROM rec r JOIN idx m ON m.i = r.i + 1
)
SELECT month, rev_cents,
       CASE WHEN fitted IS NOT NULL
            THEN CAST(floor(fitted * 1000000 + 0.5) AS BIGINT) END AS fitted_ppm,
       CAST(floor(level * 1000000 + 0.5) AS BIGINT) AS level_ppm,
       CAST(floor(trend * 1000000 + 0.5) AS BIGINT) AS trend_ppm
FROM rec
"""


# --- Croston intermittent-demand forecast ------------------------------------

CROSTON_ALPHA = 0.1
_C_A, _C_1MA = repr(CROSTON_ALPHA), repr(1.0 - CROSTON_ALPHA)


def part_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (Croston 1972) per part over the monthly
    demand spine — THE forecaster for intermittent series, where
    Holt/EWMA on the raw series chase zeros: demand SIZE and
    inter-demand INTERVAL get separate EWMAs, updated only on months
    with demand, and the rate forecast is their ratio z/p. Part-level
    monthly demand is the textbook intermittent case (each part sells
    in a minority of months).

    Semantics per part over the GLOBAL month spine (missing months are
    zeros — intervals depend on them): on the first demand month,
    z = qty and p = months elapsed since series start; on later demand
    months, z = α·qty + (1−α)·z and p = α·interval + (1−α)·p (α = 0.1,
    injected as the same repr literal in both engines); zero months
    only advance the interval counter. One output row per part: the
    final state and forecast_ppm = floor(z/p·1e6 + 0.5).

    Plan shape (the Holt pattern at part grain): monthly demand is one
    map-side-combined aggregate; the spine is a calendar-bounded
    broadcast (≤ date-span months) multiplying each part to its dense
    series; the fold is ONE aggregate-HOF pass over a per-part
    month-bounded array — parts run in parallel, the driver holds
    nothing. The oracle re-derives every step as a recursive CTE over
    (part × month-index), so the gate certifies each part's whole
    trajectory."""
    li = io.load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(F.sum("l_quantity").alias("qty"))
    span = monthly.agg(F.min("month").alias("m0"), F.max("month").alias("m1"))
    spine = span.select(
        F.explode(F.expr("sequence(m0, m1, interval 1 month)")).alias("month")
    )
    parts = monthly.select("l_partkey").distinct()
    dense = (
        parts.crossJoin(F.broadcast(spine))
        .join(monthly, ["l_partkey", "month"], "left")
        .select(
            "l_partkey", "month", F.coalesce("qty", F.lit(0.0)).alias("qty")
        )
    )
    series = dense.groupBy("l_partkey").agg(
        F.array_sort(
            F.collect_list(F.struct("month", "qty"))
        ).alias("s")
    )
    st_t = "named_struct('seen', {seen}, 'z', {z}, 'p', {p}, 'q', {q}, 'nd', {nd})"
    fold = f"""
    aggregate(
      s,
      {st_t.format(seen='false', z='0.0D', p='0.0D',
                   q='CAST(0 AS BIGINT)', nd='CAST(0 AS BIGINT)')},
      (acc, x) -> CASE
        WHEN x.qty > 0.0D AND NOT acc.seen THEN {st_t.format(
            seen='true', z='x.qty', p='CAST(acc.q + 1 AS DOUBLE)',
            q='CAST(0 AS BIGINT)', nd='CAST(1 AS BIGINT)')}
        WHEN x.qty > 0.0D THEN {st_t.format(
            seen='true',
            z=f'{_C_A} * x.qty + {_C_1MA} * acc.z',
            p=f'{_C_A} * CAST(acc.q + 1 AS DOUBLE) + {_C_1MA} * acc.p',
            q='CAST(0 AS BIGINT)', nd='acc.nd + 1')}
        ELSE {st_t.format(seen='acc.seen', z='acc.z', p='acc.p',
                          q='acc.q + 1', nd='acc.nd')}
      END,
      acc -> acc
    )
    """
    ppm = lambda c: F.floor(c * 1_000_000 + 0.5).cast("bigint")  # noqa: E731
    return series.select(
        "l_partkey",
        F.size("s").cast("int").alias("n_periods"),
        F.expr(fold).alias("st"),
    ).select(
        "l_partkey",
        "n_periods",
        F.col("st.nd").alias("n_demand_months"),
        ppm(F.col("st.z")).alias("z_ppm"),
        ppm(F.col("st.p")).alias("p_ppm"),
        ppm(F.col("st.z") / F.col("st.p")).alias("forecast_ppm"),
    )


PART_CROSTON_SQL = f"""
WITH RECURSIVE monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
         sum(l_quantity) AS qty
  FROM lineitem GROUP BY 1, 2
), span AS (
  SELECT min(month) AS m0, max(month) AS m1 FROM monthly
), spine AS (
  SELECT unnest(range(m0, m1 + INTERVAL 1 MONTH, INTERVAL 1 MONTH)) AS month
  FROM span
), idx AS (
  SELECT month, CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS i
  FROM spine
), parts AS (
  SELECT DISTINCT l_partkey FROM monthly
), dense AS (
  SELECT p.l_partkey, x.i, coalesce(m.qty, 0.0) AS qty
  FROM parts p CROSS JOIN idx x
  LEFT JOIN monthly m ON m.l_partkey = p.l_partkey AND m.month = x.month
), rec AS (
  SELECT l_partkey, i,
         qty > 0.0 AS seen,
         CASE WHEN qty > 0.0 THEN qty ELSE 0.0 END AS z,
         CASE WHEN qty > 0.0 THEN CAST(1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS p,
         CASE WHEN qty > 0.0 THEN CAST(0 AS BIGINT)
              ELSE CAST(1 AS BIGINT) END AS q,
         CASE WHEN qty > 0.0 THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS nd
  FROM dense WHERE i = 1
  UNION ALL
  SELECT d.l_partkey, d.i,
         r.seen OR d.qty > 0.0,
         CASE WHEN d.qty > 0.0 AND NOT r.seen THEN d.qty
              WHEN d.qty > 0.0 THEN {_C_A} * d.qty + {_C_1MA} * r.z
              ELSE r.z END,
         CASE WHEN d.qty > 0.0 AND NOT r.seen THEN CAST(r.q + 1 AS DOUBLE)
              WHEN d.qty > 0.0
                THEN {_C_A} * CAST(r.q + 1 AS DOUBLE) + {_C_1MA} * r.p
              ELSE r.p END,
         CASE WHEN d.qty > 0.0 THEN CAST(0 AS BIGINT) ELSE r.q + 1 END,
         r.nd + CASE WHEN d.qty > 0.0 THEN 1 ELSE 0 END
  FROM rec r JOIN dense d ON d.l_partkey = r.l_partkey AND d.i = r.i + 1
)
SELECT l_partkey,
       CAST((SELECT max(i) FROM idx) AS INT) AS n_periods,
       nd AS n_demand_months,
       CAST(floor(z * 1000000 + 0.5) AS BIGINT) AS z_ppm,
       CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS p_ppm,
       CAST(floor(z / p * 1000000 + 0.5) AS BIGINT) AS forecast_ppm
FROM rec WHERE i = (SELECT max(i) FROM idx)
"""


def seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of monthly revenue:
    ratio-to-centered-moving-average (the textbook multiplicative
    X-11-style first step). Per month t with a COMPLETE ±6-month
    neighborhood, the 2×12 centered MA is
    (m[t−6] + 2·Σ m[t−5..t+5] + m[t+6]) / 24 and the seasonal ratio is
    rev(t)/MA; the index per CALENDAR month (1..12) is the mean ratio.
    De-seasonalizing a revenue series (or a training-data ingest-rate
    series) is the standard use.

    Exactness: monthly revenue aggregates to integer cents; the MA
    numerator is the exact integer Σ₋₆..₊₆ + Σ₋₅..₊₅ (≡ the ×2-weighted
    form), so ratio_ppm = rev·24·1e6 div numerator never lets a float
    decide; the per-calendar-month mean is integer div over ppm ints.
    Months index densely as year·12+month, so RANGE frames stay
    correct under calendar GAPS (a rows-frame would silently treat
    non-adjacent months as neighbors); an incomplete window (count <
    13) yields NULL ratio and drops from the mean — both engines via
    the same conditional.

    Scale: corpus work is one map-side-combined groupBy to the monthly
    table; the frames run over the calendar-bounded series (≤
    date-span months at any corpus size — the revenue_ewma exemption)."""
    o = io.load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_cents")
    )
    return seasonal_from_monthly(monthly)


def seasonal_from_monthly(monthly: DataFrame) -> DataFrame:
    """The decomposition core over a resolved (month 'yyyy-MM',
    rev_cents) table — the exact shape the Holt family and the
    streaming monthly store (streaming_holt.HoltStore) already
    produce, so the streaming twin is this same expression over the
    accumulated store, not a reimplementation."""
    monthly = monthly.select(
        F.expr(
            "CAST(substring(month, 1, 4) AS INT) * 12"
            " + CAST(substring(month, 6, 2) AS INT)"
        ).alias("midx"),
        F.col("rev_cents").alias("cents"),
    )
    w13 = Window.orderBy("midx").rangeBetween(-6, 6)
    w11 = Window.orderBy("midx").rangeBetween(-5, 5)
    scored = monthly.select(
        "midx",
        "cents",
        F.count(F.lit(1)).over(w13).alias("n13"),
        (F.sum("cents").over(w13) + F.sum("cents").over(w11)).alias("num24"),
    ).select(
        "midx",
        F.when(
            (F.col("n13") == 13) & (F.col("num24") > 0),
            F.expr("CAST(cents * 24 * 1000000 div num24 AS BIGINT)"),
        ).alias("ratio_ppm"),
    )
    return (
        scored.groupBy(((F.col("midx") - 1) % 12 + 1).cast("int").alias("month_num"))
        .agg(
            F.count("ratio_ppm").cast("bigint").alias("n_obs"),
            F.expr(
                "CAST(CASE WHEN count(ratio_ppm) > 0 THEN "
                "sum(ratio_ppm) div count(ratio_ppm) END AS BIGINT)"
            ).alias("mean_ratio_ppm"),
        )
    )


SEASONAL_INDEX_SQL = """
WITH monthly AS (
  SELECT (year(CAST(o_orderdate AS DATE)) * 12
          + month(CAST(o_orderdate AS DATE))) AS midx,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT midx,
         CASE WHEN count(*) OVER w13 = 13
               AND (sum(cents) OVER w13 + sum(cents) OVER w11) > 0
              THEN CAST(cents * 24 * 1000000
                        // (sum(cents) OVER w13 + sum(cents) OVER w11) AS BIGINT)
         END AS ratio_ppm
  FROM monthly
  WINDOW w13 AS (ORDER BY midx RANGE BETWEEN 6 PRECEDING AND 6 FOLLOWING),
         w11 AS (ORDER BY midx RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
)
SELECT CAST((midx - 1) % 12 + 1 AS INT) AS month_num,
       CAST(count(ratio_ppm) AS BIGINT) AS n_obs,
       CAST(CASE WHEN count(ratio_ppm) > 0
            THEN sum(ratio_ppm) // count(ratio_ppm) END AS BIGINT)
         AS mean_ratio_ppm
FROM scored GROUP BY 1
"""
