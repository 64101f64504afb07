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
