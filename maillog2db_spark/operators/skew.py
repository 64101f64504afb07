"""Skew-mitigation primitives: salted broadcast-replicated join and
two-stage (salted) aggregation.

At 100 TB a single hot key (one queueid with 10^8 deliveries, one
boilerplate document hash, one NULL-ish default) lands an entire join
or aggregation partition on one executor. AQE's skew-join splitting
handles sort-merge cases after the fact; these primitives remove the
hot spot from the plan itself, and are deterministic (hash-derived
salts, no RNG) so results — and tests — are reproducible.

Semantics are exactly the unsalted equivalents; every function here is
equivalence-tested against the plain operator in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` may be arbitrarily skewed on `on`: each big
    row gets a deterministic salt in [0, n_salt) (hash of the whole row,
    so a hot key's rows spread across n_salt partitions), and `small` is
    replicated n_salt times so every (key, salt) bucket finds its match.
    Shuffle cost: big moves once (same as unsalted), small moves
    n_salt×(its size) — the standard trade when the small side is
    broadcastable-ish but the key histogram is ugly.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def salted_agg_counts(
    df: DataFrame, key: str, n_salt: int = 8
) -> DataFrame:
    """groupBy(key).count() that survives a hot key: partial-aggregate
    on (key, salt) — n_salt reducers share the hot key — then a final
    tiny aggregate on key alone. Spark's map-side combine already does
    this for count/sum; the explicit form matters for aggregates with
    no partial form downstream (collect_list, exact distinct via
    two-stage sets) and documents the pattern once, tested.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.lit(1)), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salt: int = 8
) -> DataFrame:
    """collect_set(value) per key without a single-reducer hot spot:
    per-(key, salt) partial sets, then a final flatten+dedup of at most
    n_salt small arrays per key. collect_set has no map-side combine
    benefit for a hot key — this is the case the two-stage shape exists
    for."""
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__vals"))
    )
    return partial.groupBy(key).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("__vals")))
        ).alias("values")
    )
