"""Table maintenance: small-file compaction for parquet datasets.

Streaming sinks accrete files — ``foreach_batch_upsert`` writes every
touched bucket once per micro-batch, a long-running ingest leaves
thousands of KB-sized files per partition, and at 100 TB the scan cost
of a dataset is driven by file count as much as byte count (task
scheduling, footer reads, no row-group parallelism inside tiny files).
The reference never manages storage (Salesforce does); this is the
lakehouse-side half of SURVEY §2.1's sink surface — what Delta/Iceberg
``OPTIMIZE`` does, on plain parquet.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import SparkSession

#: default target size per output file; 128 MB matches
#: ``spark.sql.files.maxPartitionBytes`` so one compacted file == one
#: scan task downstream.
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dataset_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path``, recursively."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("part-", "data-")) and not f.endswith(".crc"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    partition_by: list[str] | None = None,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files.

    Reads the dataset, repartitions to ``ceil(bytes / target)`` output
    partitions — hash-distributed on the partition columns when the
    layout is partitioned, so each Hive directory receives whole
    output partitions — and swaps the rewrite in: stage to a sibling
    tmp dir, then two renames. The swap is NOT atomic — a reader in
    the instant between renames sees a missing path, and a crash
    there leaves the data at the ``__old`` sibling (repairable with
    ``recover_compact``); run in a maintenance window (a transactional
    format does this swap in metadata instead). Local-filesystem
    paths only — scheme'd paths are rejected up front. Returns
    before/after file stats.

    Rows are preserved exactly (tested); only the file layout changes.
    On a transactional format this whole function is ``OPTIMIZE``;
    plain parquet pays one full rewrite, which is why real deployments
    compact per-partition on a schedule, not per-batch.
    """
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path):
        # the os.rename swap below only works on a local filesystem;
        # on object stores / HDFS this function would silently corrupt
        # the dataset — fail fast (a transactional format, or a
        # distcp-style staged copy, is the right tool there). The
        # guard matches ANY URI scheme prefix, including single-slash
        # Hadoop forms like ``hdfs:/data/x`` that carry no ``://``.
        raise ValueError(
            f"compact_parquet requires a local filesystem path, got {path!r}; "
            "for object-store/HDFS datasets use a transactional table format "
            "(Delta/Iceberg OPTIMIZE) or a staged-copy job"
        )
    n_before, bytes_before = _dataset_stats(path)
    df = spark.read.parquet(path)
    n_out = max(1, -(-bytes_before // target_file_bytes))
    if partition_by:
        # distribute on the partition columns: each output task holds
        # entire Hive partitions, so files-per-directory stays ~1
        df = df.repartition(n_out, *partition_by)
    else:
        df = df.repartition(n_out)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    # only drop the original once the swapped-in dataset verifies; a
    # crash before this point is repairable via recover_compact()
    n_after, bytes_after = _dataset_stats(path)
    if n_after > 0:
        shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }


def rewrite_dedup_parquet(
    spark: SparkSession,
    path: str,
    *,
    dedup_cols: list[str],
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset with exact-duplicate rows removed
    (``dropDuplicates(dedup_cols)``) — the maintenance op for append
    logs whose writers legitimately re-append under replay (e.g. the
    streaming near-dup band index: crash replays leave duplicate
    band rows that are benign for correctness but join fanout
    forever). Same staged-swap contract, sibling naming, and
    local-path guard as ``compact_parquet`` — a crash mid-swap is
    repairable with ``recover_compact(path)``; single writer per
    dataset (run in a maintenance window, never concurrently with
    the appender). Returns before/after row counts.
    """
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", path):
        raise ValueError(
            f"rewrite_dedup_parquet requires a local filesystem path, got "
            f"{path!r}; use a transactional table format elsewhere"
        )
    df = spark.read.parquet(path)
    rows_before = df.count()
    if rows_before == 0:
        # nothing to dedup — skip the rewrite entirely rather than
        # swapping in an empty copy (the rows_after==0 keep-old guard
        # below would then retain the __old_ sibling forever as a
        # silent disk leak; r8 advice)
        return {"rows_before": 0, "rows_after": 0}
    out = df.dropDuplicates(dedup_cols)
    if partition_by:
        out = out.repartition(*partition_by)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    rows_after = spark.read.parquet(path).count()
    if rows_after == 0:
        # dropDuplicates of a non-empty input cannot be empty, so an
        # empty verify read means the rewrite itself is bad — restore
        # the original and fail LOUDLY instead of silently keeping the
        # __old_ sibling around with no signal
        shutil.rmtree(path, ignore_errors=True)
        os.rename(old, path)
        raise RuntimeError(
            f"rewrite_dedup_parquet: rewrite of {path!r} verified empty "
            f"({rows_before} rows in) — original restored, rewrite discarded"
        )
    shutil.rmtree(old, ignore_errors=True)
    return {"rows_before": rows_before, "rows_after": rows_after}


def recover_compact(path: str) -> str | None:
    """Repair a ``compact_parquet`` interrupted between its two
    renames: the dataset is missing at ``path`` (or swapped with an
    empty, unverified rewrite) but intact at the ``__old_*`` sibling,
    with the rewrite at ``__compact_*``. Restores the original,
    removes stale rewrite staging, and returns the sibling it
    restored from (``None`` when nothing needed restoring).

    Safety invariants: staging is only cleared once a
    verified-nonempty dataset sits at ``path`` (never delete what may
    be the sole good copy), and when several crashed runs left
    multiple ``__old_*`` siblings the one restored is the newest one
    that actually holds data files, not whichever sorts first."""
    base = path.rstrip("/")
    parent = os.path.dirname(base) or "."
    name = os.path.basename(base)
    restored = None
    olds = [f for f in os.listdir(parent) if f.startswith(f"{name}__old_")]

    def _best_old() -> str | None:
        ranked = sorted(
            olds,
            key=lambda f: (
                _dataset_stats(os.path.join(parent, f))[0] > 0,
                os.path.getmtime(os.path.join(parent, f)),
            ),
            reverse=True,
        )
        return ranked[0] if ranked else None

    if not os.path.exists(path):
        pick = _best_old()
        if pick is not None:
            os.rename(os.path.join(parent, pick), path)
            restored = pick
            olds.remove(pick)
    elif olds and _dataset_stats(path)[0] == 0:
        # the crash left an empty/unverified rewrite swapped in at
        # ``path``; the only good copy lives at __old_* — swap it
        # back in rather than letting the cleanup below delete it
        pick = _best_old()
        if pick is not None and _dataset_stats(os.path.join(parent, pick))[0] > 0:
            shutil.rmtree(path, ignore_errors=True)
            os.rename(os.path.join(parent, pick), path)
            restored = pick
            olds.remove(pick)
    if os.path.exists(path) and _dataset_stats(path)[0] > 0:
        # stale staging (from this or any earlier interrupted run);
        # safe to drop only now that ``path`` verifies non-empty
        for f in os.listdir(parent):
            if f.startswith((f"{name}__compact_", f"{name}__old_")):
                shutil.rmtree(os.path.join(parent, f), ignore_errors=True)
    return restored
