"""Bounded per-session memo for persisted DataFrames / driver values.

Several query families share an expensive derived layer (shingle rows,
token occurrences, trained k-means centroids). Each family memoizes it per
(applicationId, sf_dir) so a session builds it once; the memo is bounded so
a long-lived session iterating over many sf dirs can't pin unbounded
storage. Eviction is FIFO — ``dict`` preserves insertion order and
``next(iter(d))`` is the OLDEST key (``dict.popitem()`` pops LIFO, which
would evict the newest other entry and retain the oldest forever).
"""

from __future__ import annotations

from typing import Any, Callable, TypeVar

T = TypeVar("T")

_MEMO_LIMIT = 4


def memo_get(
    memo: dict[tuple[str, str], T],
    key: tuple[str, str],
    build: Callable[[], T],
    unpersist: bool = True,
) -> T:
    """Return ``memo[key]``, building (and FIFO-evicting beyond the bound)
    on miss. ``unpersist=True`` calls ``.unpersist()`` on evicted entries —
    set False for plain driver-side values (e.g. collected centroid rows)."""
    val = memo.get(key)
    if val is None:
        while len(memo) >= _MEMO_LIMIT:
            old = memo.pop(next(iter(memo)))  # FIFO: oldest insertion first
            if unpersist:
                try:
                    old.unpersist()  # type: ignore[union-attr]
                except Exception:
                    pass
        val = build()
        memo[key] = val
    return val
