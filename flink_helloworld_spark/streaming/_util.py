"""Shared helpers for Arrow-batched stateful operators."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def concat_chunks(batches: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    """Merge a per-key Arrow chunk iterator into ONE frame so callers
    sort the whole micro-batch once. applyInPandasWithState and
    transformWithState hand a key's rows as multiple pdfs whenever they
    exceed ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default
    10k); sorting each chunk independently would leave cross-chunk order
    partitioning-dependent — exactly what the seq/ts columns exist to
    prevent. Returns None for an empty iterator."""
    chunks = [pdf for pdf in batches if len(pdf)]
    if not chunks:
        return None
    return chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
