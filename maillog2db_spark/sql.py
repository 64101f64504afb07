"""SQL surface: register every engine table as a temp view so users
work in pure ``spark.sql`` — the testdata star schema plus the four
canonical maillog tables the reference serves out of MySQL
(maillog2db.go:283-442; here they come from the same parse layer the
query registry uses, so SQL and DataFrame callers see identical data).

Views are lazy plans over the session-cached parse/scan bases —
registering them costs nothing until queried, and repeated SQL queries
share the same materialized subtrees as the registry queries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import io, queries, tables

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CANONICAL_TABLES = ("logs", "clients", "messages", "deliveries")


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register testdata + canonical maillog tables as temp views.
    Returns the registered view names."""
    registered = []
    for t in TESTDATA_TABLES:
        try:
            io.load(spark, sf_dir, t).createOrReplaceTempView(t)
            registered.append(t)
        except Exception:
            continue  # table absent at this sf_dir — skip, don't fail
    try:
        parsed = queries._parsed(spark, sf_dir)
    except Exception:
        # canonical tables derive from the synthesized maillog, which
        # needs the events table — a dir without one still gets the
        # plain testdata views
        return registered
    builders = {
        "logs": tables.build_logs,
        "clients": tables.build_clients,
        "messages": tables.build_messages,
        "deliveries": tables.build_deliveries,
    }
    for name, build in builders.items():
        build(parsed).createOrReplaceTempView(name)
        registered.append(name)
    return registered
