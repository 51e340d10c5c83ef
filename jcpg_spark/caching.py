"""Cache lifecycle for heavy intermediates reused across downstream joins.

Spark's exchange-reuse does not always dedupe a subtree referenced from
several branches of one query (measured: the MinHash signature aggregate
recomputed 4x in ``minhash_lsh_pairs``), so operators persist such frames.
A bare ``.persist()`` inside an operator leaks: the CacheManager holds the
plan until an explicit unpersist, so repeated registry calls accumulate
cached RDDs for the life of the session. ``swap_persist`` gives each call
site a keyed slot — persisting a new frame releases the previous one, so
at most one cache per call site is ever live; ``clear_caches`` drops them
all (long sessions, tests).

A frame from an earlier call that is unpersisted while a lazy result still
references it silently falls back to recompute — correctness is never
affected, only that stale result's speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_live: dict[str, DataFrame] = {}


def swap_persist(
    key: str, df: DataFrame, storage: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    prev = _live.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # previous session already stopped
    _live[key] = df.persist(storage)
    return df


def clear_caches() -> None:
    for key in list(_live):
        try:
            _live.pop(key).unpersist()
        except Exception:
            pass
