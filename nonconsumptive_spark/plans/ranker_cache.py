"""Session-scoped shared ranker frames for the hybrid-eval family.

Seven registry queries (q_rrf_fusion, q_hard_negatives, q_rbo_rankers,
q_ndcg_eval, q_mrr_map_eval, q_rbp_eval, q_err_eval) are evaluations OF
the same two rankers: the stop-cut shingle lexical top-N and the exact
cosine kNN top-N over the first ``n_queries`` documents.  Each consumer
previously rebuilt both rankers from the corpus scan (~1.4-2.7 s each at
sf0.1; at 100 TB each rebuild is a full tokenize + shingle + postings
pass).  The ranker OUTPUT is tiny (≤ n_queries × top_n rows) and exactly
identical across consumers by construction — this cache materializes it
once per (session, corpus, parameters) and lets every consumer read the
same frame.

Policy precedent (round-8 verdict ruling): a **session-scoped** shared
ranker keyed like the token cache — applicationId + corpus file stats —
is acceptable; anything persisted across processes is not.  This module
follows ``plans/token_cache.py`` exactly:

  * key = (applicationId, every input file's (path, mtime_ns, size),
    builder tag, builder parameters) — a corpus rewrite in-place within
    one session changes the stat and misses the cache;
  * a frame whose input files cannot be stat-ed (empty list, remote URI)
    DISABLES caching for that call rather than keying on a constant;
  * bounded FIFO eviction, evicted entries unpersisted;
  * the cached frame is the ``materialize_once`` of the same expression
    the un-cached path would have returned, so cached and uncached runs
    are result-identical (asserted by tests/test_hybrid.py).

A cold process (the driver's bench) always pays one full ranker build
inside the run; nothing here survives the session.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Callable, Sequence

from pyspark.sql import DataFrame

_MAX_ENTRIES = 8
_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_VALUES: "OrderedDict[tuple, object]" = OrderedDict()
# dict access is locked (q_kmeans_elbow materializes from worker threads);
# builders run OUTSIDE the lock — a racing duplicate build is harmless
# (result-identical by construction, last write wins)
_LOCK = threading.Lock()


def _stat_key(sources: Sequence[DataFrame]):
    """(appId, ((canonical plan, (path, mtime_ns, size)...), ...)) over
    every source frame; None when any source has no stat-able local file
    inputs (non-file frame, remote filesystem) or its plan cannot be
    canonicalized — None disables caching for that call.

    BOTH components are required: the file stats catch an in-place
    corpus rewrite within one session, and the canonicalized analyzed
    plan distinguishes two frames over the same files (a projection or
    filter of the corpus must never hit the full-corpus entry — e.g.
    pq_train runs k-means on per-subspace column slices whose input
    files are identical).  Canonicalization normalizes expression ids,
    so two independent loads of the same table still share one entry.
    Any failure of the (JVM-internal) canonicalization accessor
    degrades to cache-disabled, never to a wrong hit."""
    app = None
    stats: list[tuple] = []
    for df in sources:
        app = df.sparkSession.sparkContext.applicationId
        try:
            plan = df._jdf.queryExecution().analyzed().canonicalized().toString()
            files = df.inputFiles()
        except Exception:
            return None
        if not files:
            return None
        stats.append(("plan", plan))
        for uri in sorted(files):
            path = uri
            if path.startswith("file://"):
                path = path[len("file://"):]
            elif path.startswith("file:"):
                path = path[len("file:"):]
            if not os.path.isabs(path):
                return None
            try:
                st = os.stat(path)
            except OSError:
                return None
            stats.append((path, st.st_mtime_ns, st.st_size))
    if app is None:
        return None
    return (app, tuple(stats))


def _evict(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass


def shared_frame(tag: str, params: tuple, sources: Sequence[DataFrame],
                 build: Callable[[], DataFrame],
                 materialize_fallback: bool = False) -> DataFrame:
    """``materialize_once(build(), tag)`` computed at most once per
    (session, corpus stat, tag, params); falls back to an un-cached
    build when the sources cannot be fingerprinted.
    ``materialize_fallback`` keeps the fallback materialized too, for
    callers whose pre-cache contract always checkpointed (the quantized
    vector frame feeding multi-round Lloyd loops)."""
    from nonconsumptive_spark.plans.checkpoint import materialize_once

    base = _stat_key(sources)
    if base is None:
        out = build()
        return materialize_once(out, tag) if materialize_fallback else out
    key = (base, tag, params)
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            _CACHE.move_to_end(key)
            return hit
    built = materialize_once(build(), tag)
    with _LOCK:
        _CACHE[key] = built
        while len(_CACHE) > _MAX_ENTRIES:
            _evict(_CACHE.popitem(last=False)[1])
    return built


def shared_value(tag: str, params: tuple, sources: Sequence[DataFrame],
                 compute: Callable[[], object]) -> object:
    """Like shared_frame for small derived PYTHON values (e.g. converged
    k-means centroids): computed at most once per (session, corpus stat,
    tag, params), recomputed freely when fingerprinting is unavailable.
    Only deterministic pure functions of the fingerprinted sources may
    be cached here — that is what makes a hit result-identical."""
    base = _stat_key(sources)
    if base is None:
        return compute()
    key = (base, tag, params)
    with _LOCK:
        if key in _VALUES:
            _VALUES.move_to_end(key)
            return _VALUES[key]
    val = compute()
    with _LOCK:
        _VALUES[key] = val
        while len(_VALUES) > _MAX_ENTRIES:
            _VALUES.popitem(last=False)
    return val


def clear_ranker_cache() -> None:
    with _LOCK:
        while _CACHE:
            _evict(_CACHE.popitem(last=False)[1])
        _VALUES.clear()
