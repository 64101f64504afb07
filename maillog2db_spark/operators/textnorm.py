"""Unicode-normalized deduplication — the one text operator where a
Pandas UDF is genuinely required (SURVEY §2.8: Spark has no NFC
builtin; DuckDB has ``nfc_normalize``).

Visually-identical texts differing only in codepoint composition
(NFC 'é' vs NFD 'e'+combining-acute) or case hash to different exact-
dedup fingerprints; a multilingual corpus dedup pass canonicalizes
first. The normalizer is an Arrow-batched ``pandas_udf`` (one Python
call per batch, not per row); everything around it — fingerprint,
groupBy, counts — stays JVM-side.

The canonical form is **NFC, then ASCII-only case folding** ([A-Z] →
[a-z] via ``translate``), in that order on BOTH engines. Full Unicode
lowercasing is deliberately NOT part of the contract: it is engine-
dependent (Python/Java use full context-sensitive case mapping — final
sigma 'ΟΔΟΣ'→'οδος', 'İ'→'i'+U+0307 — while DuckDB's utf8proc uses
simple 1:1 mapping → 'οδοσ', 'i'), so any cross-engine definition
built on it diverges on real multilingual text. NFC + ASCII fold is
byte-identical everywhere (combining sequences over ASCII letters are
handled by doing NFC FIRST: 'E'+U+0301 composes to 'É' before the
fold, same as the oracle). Non-ASCII case distinctions are preserved
by design; covered by non-ASCII cases in tests/test_fuzz_oracle.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .. import io

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"

_NFC = None


def nfc():
    """The NFC normalizer UDF, created lazily: decorating at module
    level with a DDL-string return type needs an ACTIVE SparkContext at
    import time, and the driver imports the registry before it creates
    a session (found the hard way — the import crashed). Passing a
    DataType instance and building on first use keeps import
    side-effect-free. NFC only — the ASCII case fold runs JVM-side
    (``F.translate``) so the Python stage stays minimal."""
    global _NFC
    if _NFC is None:

        def _norm(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda t: unicodedata.normalize("NFC", t)
                if t is not None
                else None
            )

        _NFC = pandas_udf(_norm, StringType())
    return _NFC


def nfc_fold(col) -> F.Column:
    """NFC then ASCII-only case fold — the cross-engine canonical form
    (see module docstring). DuckDB twin:
    ``translate(nfc_normalize(text), 'A..Z', 'a..z')``."""
    return F.translate(nfc()(col), _ASCII_UPPER, _ASCII_LOWER)


def normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the NFC + ASCII-fold canonical form: one
    representative (min doc_id) per normalized fingerprint. Same plan
    shape as doc_exact_dedup — one map-side-combined shuffle on the
    fingerprint — plus the Arrow-batched normalizer in the scan
    projection."""
    p = spark.sparkContext.defaultParallelism
    d = io.load(spark, sf_dir, "documents").repartition(p, "doc_id")
    return (
        d.withColumn(
            "norm_fingerprint", F.md5(F.encode(nfc_fold(F.col("text")), "UTF-8"))
        )
        .groupBy("norm_fingerprint")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


NORMALIZED_DEDUP_SQL = f"""
SELECT md5(translate(nfc_normalize(text),
                     '{_ASCII_UPPER}', '{_ASCII_LOWER}')) AS norm_fingerprint,
       min(doc_id) AS rep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""
