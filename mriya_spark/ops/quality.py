"""Data-quality expectations and snapshot diffing.

The reference's migration loop has no validation surface at all — a
bad mapping silently writes bad rows (its only check is Salesforce
rejecting a DML call). These are the two validation shapes a
migration/lakehouse pipeline actually runs:

- ``expectations_summary`` / ``quarantine``: declarative row
  constraints (DLT-expectations shape) evaluated in ONE conditional
  aggregation pass — N constraints cost one scan, not N; quarantine
  splits violating rows out without re-evaluating.
- ``table_diff``: key-level snapshot diff (added / removed / changed /
  unchanged) as a single full-outer join — how you prove a migration
  (or a new pipeline version) moved exactly what it should have.

Both are pure DataFrame expressions: no Python in the row path, one
shuffle each (the final tiny agg; the full-outer join on the key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violates(cond: Column) -> Column:
    """A row violates an expectation when the predicate is false OR
    null (SQL three-valued logic would otherwise let nulls pass)."""
    return ~F.coalesce(cond, F.lit(False))


def expectations_summary(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """One row per expectation: (expectation, n_rows, n_violations,
    passed). Single conditional-aggregation pass over ``df``."""
    if not expectations:
        raise ValueError("no expectations given")
    # violation columns are addressed by POSITION, not by interpolated
    # name: an expectation named "orders.custkey" would otherwise be
    # parsed by F.col as a struct-field access and fail to resolve
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(_violates(cond).cast("long")).alias(f"__v_{i}")
            for i, cond in enumerate(expectations.values())
        ],
    )
    per_rows = [
        agg.select(
            F.lit(name).alias("expectation"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{i}").alias("n_violations"),
            (F.col(f"__v_{i}") == 0).alias("passed"),
        )
        for i, name in enumerate(expectations)
    ]
    out = per_rows[0]
    for p in per_rows[1:]:
        out = out.unionByName(p)
    return out.orderBy("expectation")


def quarantine(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): rows failing ANY expectation are quarantined with
    a ``__failed`` column listing the violated expectation names —
    the sink for a manual-repair queue. Good rows pass all."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(_violates(cond), F.lit(name))
                for name, cond in expectations.items()
            ]
        )
    )
    tagged = df.withColumn("__failed", failed)
    good = tagged.filter(F.size("__failed") == 0).drop("__failed")
    bad = tagged.filter(F.size("__failed") > 0)
    return good, bad


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level snapshot diff: one row per key present in either
    side, with ``status`` in {added, removed, changed, unchanged}.
    ``changed`` compares ``compare_cols`` (default: all shared
    non-key columns) null-safely."""
    cols = compare_cols or [c for c in old.columns if c != key and c in new.columns]
    # presence must be detectable even when a compare col is NULL:
    # use markers instead of value columns
    o = old.select(F.col(key), F.lit(1).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select(F.col(key), F.lit(1).alias("__in_new"),
                   *[F.col(c).alias(f"__n_{c}") for c in cols])
    j = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(F.col(key), status.alias("status"))


def per_group_quota(
    df,
    *,
    group_col: str,
    key_col: str,
    quota: int,
    seed: int = 42,
):
    """Deterministic per-group cap — the domain/language mixing step
    of corpus curation (C4/FineWeb-style: no single domain may exceed
    its quota of documents). Keeps at most ``quota`` rows per group,
    chosen by md5 hash order of (seed, key): a pseudo-random but fully
    reproducible sample, stable across runs and engines (the
    ``split_train_holdout`` posture — no rand(), no sampling state).

    One hash exchange on ``group_col`` + an in-partition sort for the
    row_number; no global sort. Skew note: a pathological mega-group
    still sorts within one task — at 100 TB cap such groups upstream
    with an approximate count filter, or raise shuffle partitions; the
    quota itself bounds every group's OUTPUT.
    Appends ``grp_rank`` (long, 1-based hash rank within the group).
    """
    from pyspark.sql import Window

    from mriya_spark.portable import md5_hex

    h = md5_hex(seed, F.col(key_col))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("grp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("grp_rank") <= quota)
    )


def weighted_sample(
    df,
    *,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
):
    """Deterministic Bernoulli sampling with PER-ROW keep probability
    ``weight_col`` (clamped to [0, 1]) — quality-weighted corpus
    sampling (FineWeb-style soft filtering: high-quality docs kept
    with high probability, low-quality ones down-weighted instead of
    hard-cut). The uniform draw is the md5-60bit of (seed, key) scaled
    to [0, 1), so the sample is a pure function of the key: stable
    across runs, engines, partitionings, and corpus growth (a doc's
    fate never changes when its neighbors change — the
    ``split_train_holdout`` posture, per-row weighted).

    One scan-local filter; no shuffle, no sampling state.
    """
    from mriya_spark.portable import md5_uniform

    u = md5_uniform(seed, F.col(key_col))
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(u < w)


def temperature_mix(
    df,
    *,
    source_col: str = "source",
    tau: float = 0.5,
    budget_frac: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 42,
):
    """Temperature-based multi-source mixing — the corpus reweighting
    step before training (multilingual/multi-domain recipes, e.g.
    mBERT/XLM-R exponent-smoothed sampling): source s with n_s docs is
    sampled with probability p_s ∝ n_s^tau (tau < 1 upweights small
    sources), scaled to an overall ``budget_frac`` of the corpus, with
    per-source keep rate min(1, budget·N·p_s / n_s).

    The draw is the deterministic md5 uniform of (seed, key) — same
    posture as ``weighted_sample``, with the per-row weight derived
    from the source's count. Shape: one count aggregation (tiny —
    one row per source), rates broadcast back, scan-local filter; no
    per-row shuffle.

    Appends ``mix_rate`` (double, the source's keep rate, rounded 6dp
    for reporting) to the kept rows.
    """
    cnt = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = cnt.agg(
        F.sum("__n").alias("__tot_n"),
        F.sum(F.pow("__n", F.lit(tau))).alias("__tot_z"),
    )
    rates = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("__tot_n")
                * (F.pow("__n", F.lit(tau)) / F.col("__tot_z"))
                / F.col("__n"),
            ).alias("__rate"),
        )
    )
    from mriya_spark.portable import md5_uniform

    u = md5_uniform(seed, F.col(key_col))
    return (
        df.join(F.broadcast(rates), on=source_col)
        .filter(u < F.col("__rate"))
        .withColumn("mix_rate", F.round("__rate", 6))
        .drop("__rate")
    )


def oversample_epochs(
    df,
    *,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 77,
    max_copies: int = 16,
):
    """Epoch-weighted replication — the other half of training-mix
    sampling that ``weighted_sample`` (keep-probability <= 1) cannot
    express: a row with weight w appears floor(w) times plus one more
    with probability frac(w), so a 2.5x source contributes each doc 2
    or 3 times and E[copies] = w exactly. The fractional draw is the
    md5 uniform of (seed, key) — same stateless posture as the rest of
    the sampling family: reproducible across runs, engines, and
    corpus growth.

    Shape: scan-local explode of ``sequence(1, n)`` — no shuffle, no
    sampling state; downstream epoch-shuffling composes via
    ``shard_shuffle`` keyed on (key, copy). ``max_copies`` caps a
    runaway weight column (a weight of 1e9 would otherwise explode a
    row into a partition-sized blowup).

    Appends ``copy`` (1-based BIGINT copy index) to the replicated
    rows; rows with effective count 0 disappear.
    """
    from mriya_spark.portable import md5_uniform

    w = F.greatest(F.col(weight_col).cast("double"), F.lit(0.0))
    base = F.floor(w).cast("long")
    extra = (md5_uniform(seed, F.col(key_col)) < (w - F.floor(w))).cast("long")
    n = F.least(base + extra, F.lit(int(max_copies)).cast("long"))
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy", F.explode(F.expr("sequence(1L, __n)")))
        .drop("__n")
    )


def _profile_wide(df, cols: list[str], distinct_agg, out_field: str):
    """Shared plumbing of the exact and approx profiles: ONE wide
    aggregation pass (4 x n_cols expressions, map-side partial), then
    a driver-side unpivot of the single wide row — no second scan, no
    per-column job. ``distinct_agg(col) -> Column`` is the only thing
    the twins disagree on (count_distinct vs approx_count_distinct),
    so keeping the rest here is what stops them drifting (e.g. both
    emit a row for an all-NULL column)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__t_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            distinct_agg(c).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs).collect()[0]
    rows = [
        (
            c,
            int(wide[f"__t_{c}"] - wide[f"__nn_{c}"]),
            int(wide[f"__d_{c}"]),
            wide[f"__mn_{c}"],
            wide[f"__mx_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        rows, f"column string, n_nulls long, {out_field} long, "
              "min_str string, max_str string"
    )


def table_profile(df, columns: list[str] | None = None):
    """ANALYZE-style one-pass column profile: nulls, distinct count,
    min/max (computed on the native type, then rendered as strings so
    heterogeneous columns share one output schema) — the
    data-profiling summary every migration/curation run wants before
    trusting a source. Profile numeric columns you care about exactly
    as integers/strings; float min/max formatting is engine-specific,
    so cast floats upstream if the profile must be engine-portable.
    """
    return _profile_wide(
        df, columns or df.columns, F.count_distinct, "n_distinct"
    )


def table_profile_approx(
    df: DataFrame, columns: list[str] | None = None, *, rsd: float = 0.05
) -> DataFrame:
    """``table_profile`` with the distinct counts estimated instead of
    exact — the 100 TB ANALYZE path. Exact per-column
    ``count_distinct`` is the one expression in the profiling family
    that stops scaling: it carries every distinct value through the
    aggregation (no bounded partial state). ``approx_count_distinct``
    is Spark's HLL++ — fixed-size register state, map-side partial
    merge, so the pass stays ONE scan with bounded memory however
    many distincts the columns hold. Estimates are engine-internal
    (register layout is Spark's own), so this variant is accuracy-
    tested against the exact profile in tests rather than
    hash-checked; ``table_profile_hll`` is the hash-checkable twin in
    the portable md5 family. Same output schema as ``table_profile``
    with ``n_distinct_est`` in place of ``n_distinct``."""
    return _profile_wide(
        df,
        columns or df.columns,
        lambda c: F.approx_count_distinct(c, rsd),
        "n_distinct_est",
    )


def table_profile_hll(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    seed: int = 17,
) -> DataFrame:
    """Approximate-distinct column profile in the engine-portable md5
    HLL family (``mriya_spark.portable``): every column's values are
    rendered to strings, hashed with one keyed 60-bit draw, and folded
    into a 256-register sketch per column — (column, bucket) max-rho
    then per-column exact integer state, the same two-aggregation
    shape as ``sketch_hll_portable``, just unpivoted across columns
    with ``stack`` first. The unpivoted frame is scope-persisted so
    the null-count branch and the register branch both read ONE
    materialization of the scan (without it each aggregation would
    re-scan the table — the r9 review finding). Distributed exactly
    like the 100 TB rollup: register state is mergeable per-bucket
    max, the heavy aggregation is over (column, bucket) keys — at
    most ``n_cols * 256`` groups leave the partial aggregation,
    however many rows or distincts the table holds. Emits the exact
    checked state (s_int, n_empty) plus the estimate and null/row
    counts. An all-NULL (or zero-row) column keeps its profile row:
    the register join is LEFT and the missing sketch coalesces to
    the exact empty state (all buckets empty -> n_empty = m,
    est_distinct = 0.0)."""
    from mriya_spark.caching import cache_scope, scoped_persist
    from mriya_spark.portable import (
        HLL_M,
        hll_bucket_rho,
        hll_estimate,
        hll_state_aggs,
        md5_long60,
    )

    cols = columns or df.columns
    stack = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    with cache_scope():
        u = scoped_persist(
            df.selectExpr(f"stack({len(cols)}, {stack}) AS (column, val)")
        )
        counts = u.groupBy("column").agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("val")).alias("n_nulls"),
        )
        bucket, rho = hll_bucket_rho(md5_long60(seed, F.col("val")))
        regs = (
            u.filter(F.col("val").isNotNull())
            .select("column", bucket.alias("bucket"), rho.alias("r"))
            .groupBy("column", "bucket")
            .agg(F.max("r").alias("m"))
        )
        agg = regs.groupBy("column").agg(*hll_state_aggs())
        # empty-sketch state: every bucket empty -> harmonic
        # denominator m * 2^53, n_empty = m (linear counting -> 0.0)
        s_int = F.coalesce(
            F.col("s_int"), F.lit(HLL_M * (1 << 53)).cast("long")
        )
        n_empty = F.coalesce(F.col("n_empty"), F.lit(HLL_M).cast("long"))
        return (
            counts.join(agg, on="column", how="left")
            .select(
                "column",
                "n_rows",
                "n_nulls",
                hll_estimate(s_int, n_empty).alias("est_distinct"),
                s_int.alias("s_int"),
                n_empty.alias("n_empty"),
            )
            .localCheckpoint(eager=True)
        )


def url_host(url: Column) -> Column:
    """Registrable host of a URL — ``parse_url(url, 'HOST')``,
    JVM-side and scan-local (the C4/FineWeb curation key: quotas,
    blocklists, and per-domain stats all group on this)."""
    return F.parse_url(url, F.lit("HOST"))


def domain_quota(
    df: DataFrame,
    *,
    url_col: str,
    key_col: str = "doc_id",
    quota: int,
    seed: int = 42,
) -> DataFrame:
    """Per-domain document cap: extract the host scan-local
    (``url_host``), then ``per_group_quota`` on it — no single domain
    exceeds ``quota`` docs, chosen by md5 hash order (reproducible
    across runs/engines; one hash exchange on the domain). Appends
    ``domain``, ``domain_total`` (the PRE-cap per-domain count — the
    curation-report stat, computed as a window over the same
    partitioning the quota rank already pays for), and ``grp_rank``.
    """
    from pyspark.sql import Window

    with_host = df.withColumn("domain", url_host(F.col(url_col)))
    with_host = with_host.withColumn(
        "domain_total",
        F.count(F.lit(1)).over(Window.partitionBy("domain")).cast("long"),
    )
    return per_group_quota(
        with_host,
        group_col="domain",
        key_col=key_col,
        quota=quota,
        seed=seed,
    )


def outlier_iqr(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier rows: everything outside
    ``[q1 - k*iqr, q3 + k*iqr]`` of ``value_col`` (per ``group_col``
    when given) — the numeric-quality screen that catches the price
    typos and unit mixups ``expectations_summary``'s static
    predicates can't know in advance. One exact-percentile aggregate
    (group-count-sized output), broadcast back, then a SCAN-LOCAL
    fence test — the corpus-sized side is never shuffled. Returns the
    offending rows with their fences attached."""
    gcols = [group_col] if group_col else []
    fences = df.groupBy(*gcols).agg(
        F.percentile(value_col, F.lit(0.25)).alias("__q1"),
        F.percentile(value_col, F.lit(0.75)).alias("__q3"),
    )
    joined = (
        df.join(F.broadcast(fences), on=gcols)
        if gcols
        else df.crossJoin(F.broadcast(fences))
    )
    lo = F.col("__q1") - k * (F.col("__q3") - F.col("__q1"))
    hi = F.col("__q3") + k * (F.col("__q3") - F.col("__q1"))
    return (
        joined.withColumn("fence_lo", lo)
        .withColumn("fence_hi", hi)
        .filter(
            (F.col(value_col) < F.col("fence_lo"))
            | (F.col(value_col) > F.col("fence_hi"))
        )
        .drop("__q1", "__q3")
    )
