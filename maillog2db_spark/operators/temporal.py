"""Temporal join operators over the ``events`` table: as-of join and
bounded range (interval) self-join.

SURVEY §2.3 lists these as "not present in the reference, available for
the capability matrix". Spark has no native ASOF/range join operator, so
both are built as compositions of existing DataFrame ops (the SURVEY's
preferred strategy (a)) chosen for their 100 TB shape:

  * as-of join  →  union + ordered window ``last(..., ignorenulls)``:
    ONE shuffle on the join key, no per-row range probe, no candidate
    explosion. This is the classic piecewise-constant-join rewrite —
    state per key is a single running value, so it also maps directly
    onto a streaming stateful op.
  * range join  →  coarse-bucket equi-join decomposition: each probe row
    joins only its own and its successor time bucket, so the join is a
    plain equi-shuffle on (key, bucket) with a residual filter — never
    a per-key cross product (the naive ``a.user_id = b.user_id AND
    b.ts BETWEEN ...`` plan degenerates to that, and at 100 TB a hot key
    with 10^6 events would be a 10^12-pair straggler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io

RANGE_WINDOW_SEC = 300


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Generic as-of join (the pandas ``merge_asof`` contract Spark
    lacks natively): for every left row, attach the value columns of
    the closest right row per ``by`` group at-or-before (``backward``)
    or at-or-after (``forward``) the left timestamp.

    Implementation is the piecewise-constant-join rewrite the
    specialized operator below uses: tag right 0 / left 1, union, ONE
    shuffle on the by-keys, running ``last(..., ignorenulls)`` over the
    merged order. No per-row range probe, no candidate explosion — the
    single-exchange plan that survives 100 TB, and the same state shape
    a streaming stateful dual keeps (one running value per key).

    ``allow_exact_matches=False`` turns the bound strict (< / >) via
    the tie-break order flip. Right rows with duplicate (by, ts) pick
    the one latest in the union order — callers needing a different
    policy should pre-aggregate the right side (same as merge_asof)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    # value columns travel as ONE struct so every output row's values
    # come from the SAME matched right row (per-column running-last
    # could mix rows when a matched row holds NULL fields)
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
    )
    l = left.select("*", F.col(left_ts).alias("_ts"), F.lit(1).alias("_kind"))
    merged = l.unionByName(r, allowMissingColumns=True)
    # backward: ascending ts; on equal ts the right row sorts first iff
    # exact matches are allowed, so the running last() sees it (or not).
    # forward: descending ts turns "at-or-after" into the same running-
    # last shape.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    kind_order = F.col("_kind").asc() if allow_exact_matches else F.col("_kind").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, kind_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.withColumn(
        "_m",
        F.last(F.when(F.col("_kind") == 0, F.col("_vals")), ignorenulls=True).over(w),
    )
    out = out.filter(F.col("_kind") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col("_m")[c])
    return out.drop("_ts", "_kind", "_vals", "_m")


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent click by the same user
    at-or-before the purchase (left as-of join, ``p.ts >= c.ts``).

    Implementation: tag clicks 0 / purchases 1, union, and take the
    running ``last`` click timestamp per user over (ts, kind) order —
    the equal-ts tiebreak (click sorts first) is exactly the >=
    inclusive bound. No click pre-dedup: duplicate (user, ts) clicks
    all carry the same match value (the ts itself), so ``last`` is
    unaffected and the whole operator is ONE exchange (the window's),
    verified in tests/test_plans.py.
    """
    e = io.load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return merged.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


ASOF_PURCHASE_CLICK_SQL = """
WITH clicks AS (
  SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Generic bounded-interval range join: all (left, right) rows per
    ``by`` group with ``right_ts - left_ts`` in the half-open interval
    (lower, upper]. Timestamps are integer columns (epoch micros or any
    monotone unit); lower may be negative (look-behind windows).

    The naive formulation (equi-join on by + range predicate) plans as
    a per-key cross product — a hot key with 10^6 rows is a 10^12-pair
    straggler at 100 TB. This decomposes the timeline into cells of the
    interval's width: a qualifying right row always lands in the cell
    of ``left_ts + lower`` or the one after it, so the join is a plain
    equi-shuffle on (by, cell) probing exactly two cells with a
    residual filter — bounded fan-out, no cross product, and each pair
    is found exactly once (the right row's cell is a single value and
    the two probed cells are distinct). Column names from both sides
    are preserved; callers alias collisions beforehand."""
    if upper <= lower:
        raise ValueError("need lower < upper")
    clash = (set(left.columns) & set(right.columns)) - set(by)
    if clash:
        raise ValueError(f"alias overlapping non-key columns first: {sorted(clash)}")
    w = upper - lower

    def _bq(name: str) -> str:
        # backtick-quote a caller-supplied column name for F.expr —
        # bare interpolation breaks on names needing quoting (spaces,
        # reserved words), which F.col-based resolution used to accept
        return "`" + name.replace("`", "``") + "`"

    def _floor_div(expr: str, width: int) -> F.Column:
        # exact integer floor division: (x - pmod(x, w)) is the floor
        # multiple (pmod is non-negative), and `div` on that multiple
        # is exact. Double division (floor(x / w)) silently misassigns
        # cells once |x| nears 2^53 — epoch nanos land there.
        return F.expr(
            f"(({expr}) - pmod({expr}, {width}L)) div {width}L"
        )

    lcell = _floor_div(f"{_bq(left_ts)} + {lower}L", w)
    probe = left.select(
        "*", F.explode(F.array(lcell, lcell + 1)).alias("_cell")
    )
    build = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in by],
        *[F.col(c) for c in right.columns if c not in by],
        _floor_div(_bq(right_ts), w).alias("_r_cell"),
    )
    gap = F.col(right_ts) - F.col(left_ts)
    cond = F.col("_cell") == F.col("_r_cell")
    for c in by:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    return (
        probe.join(build, cond)
        .filter((gap > lower) & (gap <= upper))
        .drop("_cell", "_r_cell", *[f"_r_{c}" for c in by])
    )


def event_pairs_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ordered same-user event pairs with 0 < gap <= 5 minutes —
    a bounded-interval range self-join.

    Decomposition: bucket the timeline into window-width cells; a pair
    with gap in (0, W] always spans the left row's own cell or the next
    one, so probing exactly those two cells via an equi-join on
    (user_id, bucket) finds every pair exactly once (no dedup needed:
    the right row's cell is a single value, and the two probed cells are
    distinct).
    """
    w_us = RANGE_WINDOW_SEC * 1_000_000
    e = (
        io.load_events(spark, sf_dir)
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
    )
    # integer `div`, not float division + cast — double rounding near a
    # cell boundary would misplace a row into the wrong bucket
    cell = F.expr(f"us div {w_us}")
    probe = e.select(
        F.col("event_id").alias("left_event_id"),
        "user_id",
        F.col("us").alias("left_us"),
        F.explode(F.array(cell, cell + 1)).alias("bucket"),
    )
    build = e.select(
        F.col("event_id").alias("right_event_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("us").alias("right_us"),
        cell.alias("r_bucket"),
    )
    gap = F.col("right_us") - F.col("left_us")
    return (
        probe.join(
            build,
            (probe.user_id == build.r_user_id) & (probe.bucket == build.r_bucket),
        )
        .filter((gap > 0) & (gap <= w_us))
        .select(
            "left_event_id", "right_event_id", "user_id", gap.alias("gap_us")
        )
    )


EVENT_PAIRS_WITHIN_WINDOW_SQL = f"""
SELECT a.event_id AS left_event_id, b.event_id AS right_event_id, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {RANGE_WINDOW_SEC * 1_000_000}
"""


# --- multi-touch attribution -------------------------------------------------

ATTRIB_WINDOW_SEC = 30 * 60  # look-back credited to each purchase


def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 30 minutes
    before a same-user purchase shares that purchase's value equally —
    the many-touch generalization of `asof_purchase_click`'s last-touch
    rule, and a REGISTERED composition over the generic `range_join`
    API (the cell-decomposed bounded-interval join: equi-shuffle on
    (user, cell), two probed cells, no per-user cross product).

    Exactness: purchase value quantizes to BIGINT micro-units once;
    each touch's credit is integer division by the touch count (both
    engines truncate toward zero), so credited sums are order-exact
    integers. The un-credited division remainder (< n_touches micros
    per purchase) stays with no touch — conservation up to that
    remainder is pinned in tests."""
    e = io.load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("value_micro"),
    )
    pairs = range_join(
        clicks,
        purchases,
        by=["user_id"],
        left_ts="click_us",
        right_ts="purchase_us",
        lower=0,
        upper=ATTRIB_WINDOW_SEC * 1_000_000,
    )
    touches = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = pairs.join(touches, "purchase_id").select(
        "click_id",
        "user_id",
        F.expr("value_micro div n_touches").alias("credit_micro"),
    )
    return credited.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_purchases_touched"),
        F.sum("credit_micro").alias("credited_micro"),
    )


MULTITOUCH_ATTRIBUTION_SQL = f"""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us,
         CAST(round(value * 1000000) AS BIGINT) AS value_micro
  FROM events WHERE event_type = 'purchase'
), pairs AS (
  SELECT c.click_id, c.user_id, p.purchase_id, p.value_micro
  FROM clicks c JOIN purchases p
    ON c.user_id = p.user_id
   AND p.purchase_us - c.click_us > 0
   AND p.purchase_us - c.click_us <= {ATTRIB_WINDOW_SEC * 1_000_000}
), touches AS (
  SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_touches
  FROM pairs GROUP BY purchase_id
), credited AS (
  SELECT click_id, user_id, value_micro // n_touches AS credit_micro
  FROM pairs JOIN touches USING (purchase_id)
)
SELECT click_id, user_id,
       CAST(count(*) AS BIGINT) AS n_purchases_touched,
       CAST(sum(credit_micro) AS BIGINT) AS credited_micro
FROM credited GROUP BY click_id, user_id
"""
