"""Aggregations: counts, group-bys, rollups, windows, top-k per group.

The reference's entire aggregate surface is a success-ratio count
(`/root/reference/project_utils.py:38-46`) and ``len(rows)`` totals
(`/root/reference/data_connector.py:59`). SURVEY.md §2.4 declares the
general surface our engine adds on top — all Catalyst built-ins with
map-side partial aggregation, so every groupBy here does a partial
combine before the shuffle (check ``HashAggregate(partial)`` spans in
``explain``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def count_rows(df: DataFrame) -> DataFrame:
    """A2 — total row count (`data_connector.py:59` ``query_result['size']``)."""
    return df.agg(F.count(F.lit(1)).alias("n_rows"))


def filtered_count(df: DataFrame, predicate: Column) -> DataFrame:
    """A1 — filtered count / success ratio (`project_utils.py:38-46`).

    One pass: conditional sum + total count (the reference loops the
    list twice).
    """
    return df.agg(
        F.sum(F.when(predicate, 1).otherwise(0)).alias("n_success"),
        F.count(F.lit(1)).alias("n_total"),
    )


def group_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY + aggregate list (general surface, SURVEY §2.4 note)."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def window_rank(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column | str],
    *,
    col_name: str = "rn",
) -> DataFrame:
    """row_number() per group — the building block for top-k-per-group."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(col_name, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """Top-k per group via ranked window; one shuffle on the group key.

    At scale this beats a global sort: each group sorts locally within
    its shuffle partition (AQE splits skewed groups).
    """
    return (
        window_rank(df, partition, order, col_name="__rn")
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def running_agg(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column | str],
    value: Column,
    *,
    col_name: str = "running",
) -> DataFrame:
    """Cumulative aggregate over an ordered per-key frame."""
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(col_name, F.sum(value).over(w))


def merge_agg(
    target: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental aggregate maintenance: merge a delta batch's partial
    aggregates into a materialized per-key aggregate table.

    Counts and sums are commutative monoids, so
    ``new = old (+) delta`` needs one full-outer join on the keys and
    per-column null-safe addition — the target never re-aggregates its
    raw history. This is the pattern behind every streaming rollup and
    incremental materialized view: O(delta + touched keys) per batch
    instead of O(all history). (avg/stddev ride along as sum/count and
    sum-of-squares columns; MIN/MAX work for inserts-only; distinct
    counts need a sketch — see ``queries.sketch_hll_mergeable``.)
    """
    # qualified names throughout: target and delta often derive from
    # the same source frame, which trips the ambiguous-self-join check
    # with attribute-based references
    t = target.alias("__t")
    d = delta.alias("__d")
    cond = None
    for k in keys:
        c = F.col(f"__t.{k}").eqNullSafe(F.col(f"__d.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"__t.{k}"), F.col(f"__d.{k}")).alias(k) for k in keys
    ]
    for c in (*sum_cols, count_col):
        out_cols.append(
            (
                F.coalesce(F.col(f"__t.{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d.{c}"), F.lit(0))
            ).alias(c)
        )
    return joined.select(*out_cols)
