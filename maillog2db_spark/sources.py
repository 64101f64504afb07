"""Custom `maillog` data source (Spark 4 Python Data Source API).

Closes the one impedance gap between the reference and Spark's built-in
sources (SURVEY §7 "hard parts"): the reference TAILS a single growing
file — read everything, then follow appends, re-read from the start
after truncation/rotation (`tail.TailFile(..., Follow, ReOpen)`,
maillog2db.go:168). Spark's file source is file-granular (a file is
consumed once, whole), so append-granular following needs a custom
source. The Python Data Source API makes that an ~80-line reader:

  * batch: `spark.read.format("maillog").load(path)` — byte-range
    PARTITIONED scan of one file (each task seeks to its range and
    aligns to line boundaries), so even the single-file case is
    parallel, unlike the reference's serial loop.
  * streaming: `spark.readStream.format("maillog").load(path)` — the
    offset is a byte position in the file; each micro-batch reads
    [pos, filesize), never splitting a trailing partial line. If the
    file SHRANK (logrotate truncation), the offset resets to 0 and the
    file is re-read — exactly the reference's ReOpen-replay semantics;
    downstream dedup (A1) makes the replay effectively-once, same as
    the reference's design. (Detection is the same `size < offset`
    rule tail libraries use: a rewrite that lands at >= the current
    offset is invisible to ANY offset-based tailer — the
    rotate-into-directory contract is the robust deployment.)

This source emits RAW LINES (`value string`) — parsing stays in the
shared JVM regex layer (`parsing.parse_lines`), so the slow path is
only the byte shuttle (Arrow-batched by the API), not per-row Python
logic. The built-in `text` source remains the default batch/backfill
path; this source exists for tail-contract fidelity and is exercised
stream≡batch in tests.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BATCH_SPLIT_BYTES = 32 * 1024 * 1024


def _read_lines(path: str, start: int, end: int) -> Iterator[Tuple[str]]:
    """Yield complete lines whose FIRST byte lies in [start, end).

    The standard byte-range split contract (same as Hadoop TextInput):
    a reader not starting at 0 skips its leading partial line (it
    belongs to the previous range) and reads past `end` to finish its
    last line — every line is emitted exactly once across ranges."""
    with open(path, "rb") as f:
        f.seek(start)
        if start > 0:
            f.readline()  # owned by the previous range
        while f.tell() < end:
            line = f.readline()
            if not line:
                break
            yield (line.rstrip(b"\r\n").decode("utf-8", errors="replace"),)


def _read_exact(path: str, pos: int, end: int) -> Iterator[Tuple[str]]:
    """Yield lines from byte `pos` (known to be a line start) to `end`
    (known to end a complete line) — the tail reader's offsets are
    always line-aligned by construction, so no partial-line skipping."""
    with open(path, "rb") as f:
        f.seek(pos)
        while f.tell() < end:
            line = f.readline()
            if not line:
                break
            yield (line.rstrip(b"\r\n").decode("utf-8", errors="replace"),)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class MaillogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        size = os.path.getsize(self.path)
        if size == 0:
            return [_Range(0, 0)]
        return [
            _Range(off, min(off + BATCH_SPLIT_BYTES, size))
            for off in range(0, size, BATCH_SPLIT_BYTES)
        ]

    def read(self, partition: _Range) -> Iterator[Tuple[str]]:
        return _read_lines(self.path, partition.start, partition.end)


class MaillogTailReader(SimpleDataSourceStreamReader):
    """Offset = {"pos": byte position of the next unread line}."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _complete_end(self, start: int) -> int:
        """Largest offset ≤ EOF that ends a complete line (never ship a
        half-written trailing line — the writer may still be appending)."""
        size = os.path.getsize(self.path)
        if size <= start:
            return start
        with open(self.path, "rb") as f:
            f.seek(size - 1)
            return size if f.read(1) == b"\n" else self._last_newline(f, start, size)

    @staticmethod
    def _last_newline(f, start: int, size: int) -> int:
        # scan back for the final newline; bounded by one partial line
        chunk = 4096
        pos = size
        while pos > start:
            lo = max(start, pos - chunk)
            f.seek(lo)
            buf = f.read(pos - lo)
            nl = buf.rfind(b"\n")
            if nl >= 0:
                return lo + nl + 1
            pos = lo
        return start

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        pos = start["pos"]
        size = os.path.getsize(self.path)
        if size < pos:  # truncated/rotated: ReOpen-replay from the top
            pos = 0
        end = self._complete_end(pos)
        if end <= pos:
            return iter([]), {"pos": pos}
        # list-backed iterator, not a generator: the engine's prefetch
        # cache copy.copy()s it (a micro-batch is bounded, so
        # materializing is fine)
        return iter(list(_read_exact(self.path, pos, end))), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # deterministic replay for recovery: re-read the byte span
        s, e = start["pos"], end["pos"]
        if e <= s:
            return iter([])
        return iter(list(_read_exact(self.path, s, e)))

    def commit(self, end: dict) -> None:
        pass


class MaillogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "maillog"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> MaillogBatchReader:
        return MaillogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> MaillogTailReader:
        return MaillogTailReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(MaillogDataSource)
