"""Scoped lifecycle for operator-internal ``persist()`` intermediates.

Dedup/curation operators persist expensive intermediates (shingle
frames, banded LSH indexes, SimHash block indexes) because the frames
are referenced by several joins in the returned plan — Spark would
otherwise re-evaluate the whole tokenize->hash pipeline once per
reference. The returned DataFrame is lazy, so the operator itself can
never unpersist; left alone, every build leaks its caches for the
session lifetime (VERDICT r1 item 7).

Contract implemented here:

- operators wrap their build in ``cache_scope()`` and register caches
  via ``scoped_persist(df)``;
- entering a new OUTERMOST scope releases the caches of the previous
  completed build — cached memory is bounded by one operator's working
  set, however many queries a long-lived session runs;
- ``release_caches()`` frees the current set explicitly (bench/test
  teardown, or callers that know the returned frame was materialized).

The previous build's caches are evicted even if its returned frame was
never collected; that frame stays CORRECT (persist is purely a perf
hint) and simply recomputes. Scopes nest reentrantly: a pipeline that
builds several cached stages (e.g. ``_curate`` -> ``minhash_lsh_
pairs_from_shingles``) forms one scope, released as one unit.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_depth = 0
_live: list[DataFrame] = []  # caches of the last completed outermost build
_building: list[DataFrame] = []


@contextmanager
def cache_scope() -> Iterator[None]:
    """Reentrant build scope; outermost entry evicts the previous
    build's caches, outermost exit publishes this build's caches as
    the ones the next build will evict."""
    global _depth, _live, _building
    if _depth == 0:
        release_caches()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if _depth == 0:
            _live = _building
            _building = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` whose lifetime is the enclosing
    ``cache_scope()`` (or the gap until the next scoped build, when
    called without one)."""
    df.persist()
    (_building if _depth else _live).append(df)
    return df


def release_caches() -> None:
    """Unpersist every cache the last completed build registered."""
    global _live
    for df in _live:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _live = []
