"""Scoped-cache lifetime management for LSH/ANN intermediates.

The dedup/similarity operators ``.persist()`` their signature/index tables
because those feed 3-4 consumers in one plan (band join + both verification
sides); without the cache the expensive shingle→hash pipeline recomputes per
consumer. But a bare ``.persist()`` in a library is a leak: a long-lived
session accumulates pinned blocks call after call (VERDICT r01).

``release_with``: ties ``unpersist()`` of the intermediates to the garbage
collection of the RETURNED DataFrame. The caller materializes the (small)
result and eventually drops it — at that moment the caches free. While the
result object is alive the cache stays valid for re-collection. Unpersist is
always correctness-safe (worst case the lineage recomputes), unlike
checkpoint-based scoping which pins the output itself.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _unpersist_quietly(jdfs: list) -> None:
    for j in jdfs:
        try:
            j.unpersist(False)
        except Exception:
            pass  # session already stopped — nothing to free


def release_with(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` when ``out`` is garbage-collected."""
    weakref.finalize(out, _unpersist_quietly, [c._jdf for c in cached])
    return out
