"""Filesystem batch-commit ledger shared by every persisted streaming
store (ST5 effectively-once).

One marker file per committed batch id under ``<root>/_ledger``; a
replayed ``foreachBatch`` delivery checks ``committed()`` first and
skips work it already finished. The marker is written LAST, after all
of the batch's state merges — so a crash anywhere inside the commit
window replays the batch, and each store's merges are themselves
idempotent (dedup-by-key overwrites, batch-id-partitioned dynamic
overwrites, or src_batch provenance discards), making replay converge.

This is THE single implementation of the protocol: the MinHash
signature store, the vocab/LM store, the admission-funnel store, and
the semantic-dedup vector store all mix it in, so a future hardening
(fsync, atomic rename via temp file, ledger compaction) lands in one
place and covers every store at once.
"""

from __future__ import annotations

import os
import shutil


class FileBatchLedger:
    """Mixin: requires a ``self.root`` directory attribute."""

    root: str

    def _ledger(self, batch_id: int) -> str:
        return os.path.join(self.root, "_ledger", str(batch_id))

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._ledger(batch_id))

    def mark_committed(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._ledger(batch_id)), exist_ok=True)
        with open(self._ledger(batch_id), "w"):
            pass

    def max_committed(self) -> int | None:
        """Largest committed batch id, or None before any commit —
        the internally-derived version compaction rewrites under."""
        d = os.path.join(self.root, "_ledger")
        if not os.path.isdir(d):
            return None
        ids = [int(e) for e in os.listdir(d) if e.isdigit()]
        return max(ids) if ids else None


def atomic_rewrite(df, path: str, partition_by: list[str] | None = None,
                   n_files: int = 1) -> None:
    """Rewrite a store directory from a DataFrame that READS that same
    directory, crash-safely: materialize to a sibling temp dir first,
    then swap via two ``os.rename`` calls. A static in-place overwrite
    of a directory the plan is reading loses the only durable copy if
    the job dies between Spark clearing the target and committing the
    new files (localCheckpoint blocks are session-local, so they don't
    survive the crash either) — after the swap pattern a crash at any
    point leaves either the complete old or the complete new directory
    (plus at worst a stale ``_old``/``_rewriting`` sibling the next
    rewrite clears). Single-filesystem rename is atomic on POSIX; on an
    object store this maps to the same commit-by-rename contract the
    cloud committers provide."""
    tmp = path + "_rewriting"
    old = path + "_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    w = (
        df.repartition(*partition_by) if partition_by else df.coalesce(n_files)
    ).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
