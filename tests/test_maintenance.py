"""Crash-recovery and guard-rail tests for parquet compaction.

``compact_parquet`` swaps a rewrite in with two non-atomic renames;
these tests prove the repair tool (`recover_compact`) restores the
dataset from every crash point the swap can leave behind, and that the
local-filesystem guard rejects every URI-scheme'd path form (including
single-slash Hadoop URIs like ``hdfs:/data/x``).

Reference analogue: the swap intent of ``bulk_update``
(/root/reference/data_connector.py:281-291) — the reference delegates
durability to Salesforce; on plain parquet we own it.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from mriya_spark.maintenance import (
    _dataset_stats,
    compact_parquet,
    recover_compact,
)


def _write_dataset(spark, path, n=100, tag="a"):
    (
        spark.range(n)
        .select(
            F.col("id"),
            F.concat(F.lit(tag), F.col("id").cast("string")).alias("v"),
        )
        .coalesce(2)
        .write.parquet(path)
    )


def _rows(spark, path):
    return {(r.id, r.v) for r in spark.read.parquet(path).collect()}


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / f"ds_{uuid.uuid4().hex[:8]}")


@pytest.mark.parametrize(
    "bad",
    ["s3://bucket/ds", "s3a://bucket/ds", "hdfs://nn/ds", "hdfs:/data/ds",
     "file:/tmp/ds", "file:///tmp/ds", "abfss://c@acct/ds"],
)
def test_compact_rejects_schemed_paths(spark, bad):
    """Any URI-scheme prefix must fail fast — the os.rename swap only
    works on a local filesystem; silently 'compacting' an object-store
    path would corrupt the dataset."""
    with pytest.raises(ValueError, match="local filesystem"):
        compact_parquet(spark, bad)


def test_compact_accepts_plain_local_path(spark, workdir):
    _write_dataset(spark, workdir)
    stats = compact_parquet(spark, workdir)
    assert stats["files_after"] >= 1
    assert _dataset_stats(workdir)[0] > 0


def test_recover_noop_on_healthy_dataset(spark, workdir):
    _write_dataset(spark, workdir)
    before = _rows(spark, workdir)
    assert recover_compact(workdir) is None
    assert _rows(spark, workdir) == before


def test_recover_crash_between_renames(spark, workdir):
    """Crash point: after rename(path, old), before rename(tmp, path).
    The dataset is gone from ``path``; the original sits at __old_*
    and the finished rewrite at __compact_*. Recovery must put the
    original back and clear both staging dirs."""
    _write_dataset(spark, workdir)
    original = _rows(spark, workdir)
    parent = os.path.dirname(workdir)
    name = os.path.basename(workdir)
    old = f"{workdir}__old_{uuid.uuid4().hex[:8]}"
    tmp = f"{workdir}__compact_{uuid.uuid4().hex[:8]}"
    _write_dataset(spark, tmp, n=100, tag="rewrite")
    os.rename(workdir, old)  # simulated crash: second rename never ran

    restored = recover_compact(workdir)
    assert restored == os.path.basename(old)
    assert _rows(spark, workdir) == original
    leftovers = [
        f for f in os.listdir(parent)
        if f.startswith((f"{name}__old_", f"{name}__compact_"))
    ]
    assert leftovers == []


def test_recover_crash_before_first_rename(spark, workdir):
    """Crash point: rewrite staged at __compact_*, neither rename ran.
    ``path`` is healthy — recovery must leave it untouched and only
    sweep the stale rewrite."""
    _write_dataset(spark, workdir)
    original = _rows(spark, workdir)
    tmp = f"{workdir}__compact_{uuid.uuid4().hex[:8]}"
    _write_dataset(spark, tmp, n=50, tag="rewrite")

    assert recover_compact(workdir) is None
    assert _rows(spark, workdir) == original
    assert not os.path.exists(tmp)


def test_recover_empty_swapped_rewrite_restores_old(spark, workdir):
    """ADVICE r5 (medium): if a crash left an EMPTY rewrite swapped in
    at ``path`` with the sole good copy at __old_*, recovery must
    restore the good copy — the old behavior deleted it."""
    _write_dataset(spark, workdir)
    original = _rows(spark, workdir)
    old = f"{workdir}__old_{uuid.uuid4().hex[:8]}"
    os.rename(workdir, old)
    os.makedirs(workdir)  # swapped-in "rewrite" with zero data files

    restored = recover_compact(workdir)
    assert restored == os.path.basename(old)
    assert _rows(spark, workdir) == original
    assert not os.path.exists(old)


def test_recover_multiple_crashed_runs_picks_data_bearing_newest(spark, workdir):
    """Several interrupted runs can accumulate __old_* siblings; the
    restore must pick the newest one that actually holds data files,
    not whichever sorts lexicographically first."""
    parent = os.path.dirname(workdir)
    name = os.path.basename(workdir)
    # __old_000... sorts first but is an empty husk
    empty_old = f"{workdir}__old_0000empty"
    os.makedirs(empty_old)
    good_old = f"{workdir}__old_zzzz{uuid.uuid4().hex[:4]}"
    _write_dataset(spark, good_old, tag="good")
    good = _rows(spark, good_old)
    now = time.time()
    os.utime(empty_old, (now, now))  # even newer mtime: data wins over age

    restored = recover_compact(workdir)
    assert restored == os.path.basename(good_old)
    assert _rows(spark, workdir) == good
    leftovers = [f for f in os.listdir(parent) if f.startswith(f"{name}__old_")]
    assert leftovers == []


def test_compact_keeps_old_when_rewrite_verifies_empty(spark, workdir, monkeypatch):
    """compact_parquet itself must not drop __old_* unless the swapped
    dataset verifies non-empty, and recover_compact must then undo the
    bad swap end-to-end."""
    import mriya_spark.maintenance as M

    _write_dataset(spark, workdir)
    original = _rows(spark, workdir)

    real_stats = M._dataset_stats
    calls = {"n": 0}

    def flaky_stats(path):
        calls["n"] += 1
        # the post-swap verification is the 2nd call from compact_parquet
        if calls["n"] == 2:
            return (0, 0)
        return real_stats(path)

    monkeypatch.setattr(M, "_dataset_stats", flaky_stats)
    stats = compact_parquet(spark, workdir)
    monkeypatch.setattr(M, "_dataset_stats", real_stats)
    assert stats["files_after"] == 0  # verification reported empty
    parent = os.path.dirname(workdir)
    name = os.path.basename(workdir)
    olds = [f for f in os.listdir(parent) if f.startswith(f"{name}__old_")]
    assert len(olds) == 1  # original preserved, not rmtree'd

    recover_compact(workdir)
    assert _rows(spark, workdir) == original


def test_rewrite_dedup_empty_input_is_noop_without_old_leak(spark, workdir):
    """An empty dataset must short-circuit before the staged swap: no
    rewrite, no __old_ sibling left behind (the r8-advice leak), and
    the dataset still readable afterwards."""
    from mriya_spark.maintenance import rewrite_dedup_parquet

    spark.range(5).filter("id < 0").select(
        F.col("id"), F.lit("x").alias("v")
    ).coalesce(1).write.parquet(workdir)
    assert _rows(spark, workdir) == set()

    stats = rewrite_dedup_parquet(spark, workdir, dedup_cols=["id", "v"])
    assert stats == {"rows_before": 0, "rows_after": 0}
    parent = os.path.dirname(workdir)
    name = os.path.basename(workdir)
    siblings = [
        f
        for f in os.listdir(parent)
        if f.startswith((f"{name}__old_", f"{name}__compact_"))
    ]
    assert siblings == []
    assert _rows(spark, workdir) == set()


def test_rewrite_dedup_removes_dupes_and_cleans_staging(spark, workdir):
    """Happy path: duplicate rows drop, and neither staging sibling
    survives the completed swap."""
    from mriya_spark.maintenance import rewrite_dedup_parquet

    df = spark.range(10).select(
        (F.col("id") % 5).alias("id"), F.lit("v").alias("v")
    )
    df.coalesce(2).write.parquet(workdir)

    stats = rewrite_dedup_parquet(spark, workdir, dedup_cols=["id", "v"])
    assert stats == {"rows_before": 10, "rows_after": 5}
    parent = os.path.dirname(workdir)
    name = os.path.basename(workdir)
    siblings = [
        f
        for f in os.listdir(parent)
        if f.startswith((f"{name}__old_", f"{name}__compact_"))
    ]
    assert siblings == []
    assert len(_rows(spark, workdir)) == 5


def test_sweep_stale_age_gated(tmp_path, monkeypatch):
    """r6 ADVICE: uuid-suffixed cache artifacts are GC'd once stale,
    while fresh siblings (possibly a concurrent run mid-write) and
    non-matching names are left alone."""
    import os
    import time

    from mriya_spark import cachedir

    monkeypatch.setenv("MRIYA_SPARK_CACHE_DIR", str(tmp_path))
    d = cachedir.cache_dir("stream_v2")
    old = os.path.join(d, "upsert_target_deadbeef")
    fresh = os.path.join(d, "upsert_target_cafebabe")
    other = os.path.join(d, "events_fixture_4")
    for p in (old, fresh, other):
        os.makedirs(p)
    stale_t = time.time() - 7200
    os.utime(old, (stale_t, stale_t))
    os.utime(other, (stale_t, stale_t))
    cachedir.sweep_stale("stream_v2", "upsert_target_", "ckpt_upsert_")
    assert not os.path.exists(old)  # stale + matching -> swept
    assert os.path.exists(fresh)  # fresh -> kept
    assert os.path.exists(other)  # stale but non-matching -> kept


def test_sweep_stale_files_and_live_checkpoints(tmp_path, monkeypatch):
    """r7 ADVICE: (a) stale plain FILES are collected too (rmtree
    silently no-ops on them); (b) a directory whose top-level mtime is
    stale but whose children are fresh — the shape of a LIVE streaming
    checkpoint writing into offsets/ — is NOT swept."""
    import os
    import time

    from mriya_spark import cachedir

    monkeypatch.setenv("MRIYA_SPARK_CACHE_DIR", str(tmp_path))
    d = cachedir.cache_dir("stream_v2")
    stale_t = time.time() - 7200

    stale_file = os.path.join(d, "ckpt_upsert_leftover.tmp")
    with open(stale_file, "w") as fh:
        fh.write("x")
    os.utime(stale_file, (stale_t, stale_t))

    live_ckpt = os.path.join(d, "ckpt_upsert_live")
    offsets = os.path.join(live_ckpt, "offsets")
    os.makedirs(offsets)
    with open(os.path.join(offsets, "0"), "w") as fh:
        fh.write("{}")
    # top-level dir mtime is stale, but offsets/ keeps being touched
    os.utime(live_ckpt, (stale_t, stale_t))

    cachedir.sweep_stale("stream_v2", "ckpt_upsert_")
    assert not os.path.exists(stale_file)  # stale file -> removed
    assert os.path.exists(live_ckpt)  # live checkpoint -> kept
