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


# -- mergeable quantile sketch (portable md5 family) -------------------
#
# The percentile analogue of the portable HLL: `percentile_sampled`
# gives a one-shot deterministic sample, but the 100 TB quantile path
# needs a SKETCH — bounded state, associative merge, and (here) a
# canonical final state an oracle can replay. This is the KLL
# bottom-sampler run to a single level: every row draws a 60-bit
# md5 uniform; the sketch at level L keeps exactly the rows with
# u60 < 2^(60-L) (an exact 2^-L uniform subsample), with L the
# smallest level whose survivor count fits the budget k. Because the
# state is a pure FUNCTION of the data and the hash — not of
# partitioning, arrival order, or merge shape — it is bit-identical
# in any engine, and the merge is exact: union the states, re-raise
# the level until <= k survive (the survivor predicate at a higher
# level is a subset filter of the state, so merging loses nothing a
# direct sketch of the union would have kept). Rank error of the
# quantile estimates is the uniform-sample bound O(1/sqrt(k)).

QSKETCH_MAX_LEVEL = 40
QSKETCH_K = 512
QSKETCH_SEED = 17


def quantile_sketch(
    df: DataFrame,
    *,
    value_col: str,
    key_col: str,
    k: int = QSKETCH_K,
    seed: int = QSKETCH_SEED,
) -> tuple[int, DataFrame]:
    """Build the sketch: returns ``(level, state)`` where ``state`` is
    the <= ``k``-row DataFrame ``(u60, value)`` of level-``level``
    survivors. Two passes, both map-heavy: one scalar aggregate
    computing the survivor count at EVERY candidate level (41 summed
    flags, map-side combined to a single row — the level pick is a
    bounded driver scalar, the IVF-centroid control-point pattern),
    then one scan-local integer filter ``u60 < 2^(60-level)`` that a
    parquet reader could push down. Nothing shuffles on the data
    side; the state itself is sketch-sized."""
    from mriya_spark.portable import md5_long60

    u = df.select(
        md5_long60(seed, F.col(key_col)).alias("u60"),
        F.col(value_col).alias("value"),
    )
    counts = u.agg(
        *[
            F.sum(
                (F.col("u60") < F.lit(1 << (60 - l))).cast("long")
            ).alias(f"c{l}")
            for l in range(QSKETCH_MAX_LEVEL + 1)
        ]
    ).collect()[0]
    level = next(
        (
            l
            for l in range(QSKETCH_MAX_LEVEL + 1)
            if int(counts[f"c{l}"] or 0) <= k
        ),
        None,
    )
    if level is None:
        raise ValueError(
            f"no level <= {QSKETCH_MAX_LEVEL} fits k={k} survivors"
        )
    state = u.filter(F.col("u60") < F.lit(1 << (60 - level)))
    return level, state


def quantile_sketch_merge(
    sketches: Sequence[tuple[int, DataFrame]],
    *,
    k: int = QSKETCH_K,
) -> tuple[int, DataFrame]:
    """Associative merge: union the states, start from the max input
    level, and raise until <= ``k`` survive. Counting happens on
    sketch-sized unions (<= sum of the input budgets), never on raw
    data — this is the rollup step a 1000-executor tree aggregation
    or a cross-day sketch store runs. The result equals the direct
    sketch of the concatenated inputs (tested), which is the whole
    point of a mergeable summary."""
    if not sketches:
        raise ValueError("nothing to merge")
    level = max(lv for lv, _ in sketches)
    state = sketches[0][1]
    for _, s in sketches[1:]:
        state = state.unionByName(s)
    state = state.filter(F.col("u60") < F.lit(1 << (60 - level)))
    state = state.localCheckpoint(eager=True)
    while state.count() > k:
        if level >= QSKETCH_MAX_LEVEL:
            raise ValueError("merge exceeded QSKETCH_MAX_LEVEL")
        level += 1
        state = state.filter(F.col("u60") < F.lit(1 << (60 - level)))
    return level, state


def quantiles_from_sketch(
    state: DataFrame, qs: Sequence[float]
) -> DataFrame:
    """Estimate quantiles from the sketch state: the survivors are an
    exact uniform subsample, so the q-quantile estimate is the value
    at rank ``max(1, ceil(q*m))`` of the value-sorted state
    (ties broken by u60 for a deterministic, engine-replayable rank).
    The global sort is over <= k rows — sketch-sized, not data-sized.
    Returns ``(q, est)`` rows."""
    import math

    m = state.count()
    if m == 0:
        raise ValueError("empty sketch state")
    targets = [(float(q), max(1, math.ceil(q * m))) for q in qs]
    tdf = state.sparkSession.createDataFrame(targets, "q double, r long")
    ranked = state.withColumn(
        "r", F.row_number().over(Window.orderBy("value", "u60"))
    )
    return ranked.join(F.broadcast(tdf), "r").select("q", "value")


def quantile_sketch_grouped(
    df: DataFrame,
    *,
    value_col: str,
    key_col: str,
    group_col: str,
    k: int = QSKETCH_K,
    seed: int = QSKETCH_SEED,
) -> DataFrame:
    """Per-group quantile sketches PLUS their merge, in one frame:
    ``(segment, level, u60, value)`` state rows for every group and a
    ``'__merged'`` segment holding the merge of all of them (the
    ``sketch_hll_portable`` segments+merge posture). This is the
    rollup shape — per-day/per-source sketches stored cheap, any
    combination answerable later without touching raw data.

    One grouped aggregate computes all 41 candidate-level survivor
    counts per group (G rows collected — bounded, the dimension-sized
    control point); the survivor filter is a broadcast threshold join,
    scan-local on the data side. The merged segment goes through the
    REAL ``quantile_sketch_merge`` path — union of sketch-sized
    states, level re-raised — so the gate checks the merge recurrence
    itself, not a re-derivation from raw rows."""
    from mriya_spark.portable import md5_long60

    u = df.select(
        F.col(group_col).cast("string").alias("segment"),
        md5_long60(seed, F.col(key_col)).alias("u60"),
        F.col(value_col).alias("value"),
    )
    counts = u.groupBy("segment").agg(
        *[
            F.sum(
                (F.col("u60") < F.lit(1 << (60 - l))).cast("long")
            ).alias(f"c{l}")
            for l in range(QSKETCH_MAX_LEVEL + 1)
        ]
    ).collect()
    levels: dict[str | None, int] = {}
    for row in counts:
        lv = next(
            (
                l
                for l in range(QSKETCH_MAX_LEVEL + 1)
                if int(row[f"c{l}"] or 0) <= k
            ),
            None,
        )
        if lv is None:
            raise ValueError(
                f"group {row['segment']!r}: no level <= "
                f"{QSKETCH_MAX_LEVEL} fits k={k} survivors"
            )
        levels[row["segment"]] = lv
    spark = df.sparkSession
    ldf = spark.createDataFrame(
        [(s, lv, 1 << (60 - lv)) for s, lv in levels.items()],
        "segment string, level long, thr long",
    )
    # null-SAFE join (r10 review): a NULL group is a real segment —
    # a plain equi-join would silently drop its rows from both its
    # own state and '__merged', breaking merged == direct-sketch
    state = (
        u.join(
            F.broadcast(ldf.withColumnsRenamed({"segment": "__lseg"})),
            u["segment"].eqNullSafe(F.col("__lseg")),
        )
        .filter(F.col("u60") < F.col("thr"))
        .select("segment", "level", "u60", "value")
        .localCheckpoint(eager=True)
    )
    per_group = [
        (
            lv,
            state.filter(
                F.col("segment").eqNullSafe(F.lit(s))
            ).select("u60", "value"),
        )
        for s, lv in levels.items()
    ]
    m_level, m_state = quantile_sketch_merge(per_group, k=k)
    merged = m_state.select(
        F.lit("__merged").alias("segment"),
        F.lit(m_level).cast("long").alias("level"),
        "u60",
        "value",
    )
    return state.unionByName(merged)
