"""Shared wiring for the directory-following foreachBatch streams.

Every incremental store in this engine follows the same source shape —
a directory of parquet drops read as a file stream, each micro-batch
handed to an idempotent ledger-gated ingest function — and before r9
each module carried its own verbatim copy of the reader/writer block
(~25 copies). One helper means a fix to the shared shape (schema
probe, backpressure option, trigger policy) lands everywhere at once.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def start_foreach_batch_stream(
    spark: SparkSession,
    src_dir: str,
    ingest: "Callable[[SparkSession, DataFrame, int], None]",
    checkpoint_dir: str,
    query_name: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = 1,
    select: Sequence[str] | None = None,
):
    """Follow ``src_dir`` (a directory of parquet drops) and hand each
    micro-batch to ``ingest(spark, batch_df, batch_id)``.

    ``max_files_per_trigger`` is the backpressure bound (ST7; None
    disables it), ``available_now`` drains the backlog and terminates
    (the test/replay mode), ``select`` optionally projects the stream
    down to the columns the ingest needs (column pruning at the
    source)."""
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(src_dir)
    if select is not None:
        df = df.select(*select)
    writer = (
        df.writeStream.foreachBatch(
            lambda b, bid: ingest(b.sparkSession, b, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
