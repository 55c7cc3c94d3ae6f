"""Bucketed (co-located) joins: the shuffle-free repeated-join layout.

At 100 TB the single most expensive plan node is the shuffle a
fact-fact join emits. When the same join key is used query after query
(lineitem ⨝ orders on orderkey, events ⨝ users on user_id), the scale
answer is to pay ONE layout shuffle at write time — ``bucketBy(N,
key)`` — and never again: both sides hash-partitioned into the same N
buckets on disk means every subsequent equi-join on that key is a
per-bucket sort-merge with NO Exchange on either side (asserted in
``tests/test_plans.py``).

The reference cannot express this (Salesforce owns its storage); this
is the lakehouse-side layout control a migration off it gains. Sizing:
N buckets should put one bucket's working set within an executor's
memory — 8 here for MB-scale fixtures, 1024+ for a 100 TB fact table
(bucket count, unlike partition count, must be chosen up front: both
sides must agree exactly for co-location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed managed table (parquet).

    Repartitions to the bucket expression first so each bucket is one
    file per write (bucketBy alone writes tasks x buckets files — the
    small-file problem ``maintenance.compact_parquet`` exists to fix,
    avoided here at write time instead).
    """
    out = df.repartition(buckets, *bucket_cols)
    w = out.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on``: with matching bucket counts
    Catalyst plans a co-located sort-merge join — zero Exchange — for
    any data size; broadcast may still win for tiny sides (also
    shuffle-free). Output reports both sides' columns like a plain
    join; correctness is layout-independent (oracle-checked)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
