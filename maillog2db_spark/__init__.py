"""maillog2db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rdlaitila/maillog2db.

The reference (/root/reference/maillog2db.go) is a single-threaded Go
program that tails a Postfix maillog, classifies lines with a regex
cascade, and maintains four MySQL tables (raw logs, clients, messages,
deliveries) under append-dedup / keyed-upsert disciplines. This package
re-expresses those semantics as declarative Spark DataFrame plans
(Catalyst-optimizable, shuffle-based, partitioned), plus the extended
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Layout:
    parsing      — regex constants + line parser (reference maillog2db.go:44-59)
    tables       — the four table builders (reference maillog2db.go:283-442)
    synth        — deterministic maillog synthesizer over the events table,
                   emitted both as Spark expressions and as DuckDB SQL so the
                   whole pipeline is oracle-checkable
    session      — SparkSession factory tuned for the test harness
    operators/   — dedup, similarity, text, windows, multimodal
    streaming    — structured-streaming ingest reusing the batch builders
    sinks        — parquet / JDBC writers
"""

__version__ = "0.1.0"
