"""Unicode-normalized deduplication — the one text operator where a
Pandas UDF is genuinely required (SURVEY §2.8: Spark has no NFC
builtin; DuckDB has ``nfc_normalize``).

Visually-identical texts differing only in codepoint composition
(NFC 'é' vs NFD 'e'+combining-acute) or case hash to different exact-
dedup fingerprints; a multilingual corpus dedup pass canonicalizes
first. The normalizer is an Arrow-batched ``pandas_udf`` (one Python
call per batch, not per row); everything around it — fingerprint,
groupBy, counts — stays JVM-side. The contract (NFC + str.lower) is
chosen because DuckDB's ``nfc_normalize(lower(...))`` computes the
identical bytes, keeping the operator oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .. import io

_NFC_LOWER = None


def nfc_lower():
    """The normalizer UDF, created lazily: decorating at module level
    with a DDL-string return type needs an ACTIVE SparkContext at
    import time, and the driver imports the registry before it creates
    a session (found the hard way — the import crashed). Passing a
    DataType instance and building on first use keeps import
    side-effect-free."""
    global _NFC_LOWER
    if _NFC_LOWER is None:

        def _norm(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda t: unicodedata.normalize("NFC", t).lower()
                if t is not None
                else None
            )

        _NFC_LOWER = pandas_udf(_norm, StringType())
    return _NFC_LOWER


def normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the NFC+lowercase canonical form: one
    representative (min doc_id) per normalized fingerprint. Same plan
    shape as doc_exact_dedup — one map-side-combined shuffle on the
    fingerprint — plus the Arrow-batched normalizer in the scan
    projection."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    return (
        d.withColumn(
            "norm_fingerprint", F.md5(F.encode(nfc_lower()(F.col("text")), "UTF-8"))
        )
        .groupBy("norm_fingerprint")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


NORMALIZED_DEDUP_SQL = """
SELECT md5(nfc_normalize(lower(text))) AS norm_fingerprint,
       min(doc_id) AS rep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""
