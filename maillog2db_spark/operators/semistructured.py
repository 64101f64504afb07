"""Semi-structured (JSON) column parsing over ``events.props``.

The reference has no JSON anywhere (SURVEY §2.6 — its only "nested"
data is string-encoded `rdns[ip]` / `a/b/c` split by regex), but a
production event stream carries JSON properties, and the driver's
events table does (`props` = '{"k": N}').

Spark-first design: `from_json` with an EXPLICIT schema, not
`get_json_object` per field — one parse per row materializes a typed
struct that whole-stage codegen then field-accesses for free, whereas
get_json_object re-parses the string once per extracted field. At
100 TB the schema also lets the scan prune to the single string column
and keeps the parsed struct columnar in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import io

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over the JSON `props.k` field: one
    `from_json` parse, then integer aggregates (order-independent, so
    the cross-engine gate is exact)."""
    e = io.load_events(spark, sf_dir)
    k = F.from_json("props", PROPS_SCHEMA).getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


PROPS_JSON_STATS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""
