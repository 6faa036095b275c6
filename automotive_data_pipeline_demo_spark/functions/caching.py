"""Cache-lifetime hooks for multi-consumer operators.

Several operators persist an intermediate frame that two downstream
branches of the SAME returned plan consume (e.g. ``bm25_topk``'s per-doc
counter frame feeds both the corpus-stats aggregate and the scoring
join). The returned DataFrame is lazy, so the operator cannot unpersist
before the caller's terminal action — doing so would re-run the shared
subtree once per consumer, the exact cost the persist removes.

The library therefore ties the persisted intermediates to the returned
frame: operators call :func:`register_caches` on their result, and a
long-lived driver session calls :func:`release_caches` once its action
on that result has completed. Short-lived sessions (tests, the bench
CLI) may instead rely on ``spark.catalog.clearCache()`` between queries
— bench.py already does, per-trial — or on session teardown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_graft_persisted"


def eager_fill(df: DataFrame) -> DataFrame:
    """Materialize a just-persisted frame's cache with one count before
    its consumers fan out.

    AQE materializes independent downstream query stages CONCURRENTLY,
    and Spark fills cached partitions lazily per consumer task: racing
    first-consumers each compute an uncached partition and all but one
    discard the result ("Block already exists ... not re-adding") — for
    an expensive shared subtree that re-runs the whole fold once per
    racing consumer. A single bounded action serializes the fill ahead
    of the fan; every materialization after it is a cache read. Use
    only where the persisted fold is expensive and feeds 2+ stages of
    ONE action (r14: simhash_dedup's fingerprint fold, the drift
    report's (source, bin) aggregate).
    """
    df.count()
    return df


def register_caches(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Tag ``result`` with the persisted frames its plan depends on.

    Returns ``result`` (same object) so operators can tag at the return
    site. Tags accumulate, so an operator composing another operator's
    tagged result may re-register it together with its own intermediates:
    nested tags are adopted from every passed frame, and a passed frame is
    itself held only if it is actually persisted — so passing a composed
    operator's (unpersisted) result frame hands over just its holdings.
    """
    held = list(getattr(result, _ATTR, ()))
    for frame in intermediates:
        held.extend(getattr(frame, _ATTR, ()))  # adopt nested tags
        if getattr(frame, "is_cached", False):
            held.append(frame)
    setattr(result, _ATTR, held)
    return result


def release_caches(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate registered on ``result``.

    Call after the terminal action on ``result`` (collect/write); a later
    re-action on the same frame recomputes the shared subtrees instead of
    reading cache. Returns the number of frames released; safe to call on
    untagged frames (no-op) and idempotent.
    """
    held = list(getattr(result, _ATTR, ()))
    seen: set[int] = set()
    n = 0
    for frame in held:
        if id(frame) in seen:
            continue
        seen.add(id(frame))
        frame.unpersist(blocking=blocking)
        n += 1
    setattr(result, _ATTR, [])
    return n
