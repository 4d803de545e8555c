"""Bounded caching for library operators.

Operators like minhash_lsh_dedup and embedding_near_duplicates persist an
intermediate frame that two downstream joins share. A bare ``.persist()``
leaks executor storage in long-running drivers (one cached frame per
call, never released, until eviction thrashing). ``bounded_persist``
keeps at most ``keep`` live cached frames per tag: persisting a new frame
unpersists the oldest one beyond the bound, so repeated operator calls
hold O(1) storage while the current call still gets its reuse win.

Callers that want full control can pass ``persist=False`` to the
operators and manage caching themselves.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

_live: dict[str, deque] = {}


def bounded_persist(df: DataFrame, *, tag: str, keep: int = 1) -> DataFrame:
    """Persist ``df``; unpersist the oldest frame of this tag beyond
    ``keep`` live ones. Returns the persisted frame."""
    q = _live.setdefault(tag, deque())
    while len(q) >= max(1, keep):
        old = q.popleft()
        try:
            old.unpersist()
        except Exception:
            pass  # session may be gone; nothing to release
    df = df.persist()
    q.append(df)
    return df
