"""Declared query registry: SURVEY.md §2 query ids -> (Spark fn, oracle SQL).

Each entry pairs a PySpark implementation with its ANSI-SQL twin that
DuckDB runs over the same parquet tables (driver contract,
``__spark_entry__.py``). Hash-safety rules observed throughout:

- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, 4)`` on both sides (different
  summation orders legitimately differ in the last ulp);
- DuckDB integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT,
  Spark keeps LongType);
- anything nondeterministic (limit without order, random generation,
  LSH bucketing) is either made deterministic (sort first, fixed
  seeds) or registered without an oracle (rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mriya_spark.catalog import Catalog

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None  # None -> rows-only check (non-SQL-expressible)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(fn=fn, oracle=oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.1 scans
# ---------------------------------------------------------------------------

@register("scan_table", "SELECT * FROM nation")
def scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — full table scan (reference: `data_connector.py:55-69`
    ``fetch_all_data`` paginated SOAP scan; pagination ≙ partitioned
    parquet scan)."""
    return _cat(spark, sf_dir).table("nation")


# ---------------------------------------------------------------------------
# §2.2 projections / filters
# ---------------------------------------------------------------------------

@register(
    "project_columns",
    "SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — column projection (`mapping_parser.py:31-41`). Pruned scan:
    ReadSchema shows only the three columns."""
    from mriya_spark.ops.relational import project

    return project(
        _cat(spark, sf_dir).table("customer"), ["c_custkey", "c_name", "c_acctbal"]
    )


@register(
    "filter_expr",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_expr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — WHERE pass-through (`mapping_parser.py:21,39-40`); predicate
    reaches the parquet scan as PushedFilters."""
    from mriya_spark.ops.relational import filter_expr, project

    df = _cat(spark, sf_dir).table("lineitem")
    df = filter_expr(df, "l_quantity > 45 AND l_returnflag = 'R'")
    return project(df, ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])


_ISIN_KEYS = list(range(1, 200, 3))

@register(
    "filter_isin",
    f"""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_custkey IN ({', '.join(str(k) for k in _ISIN_KEYS)})
    """,
)
def filter_isin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — IN-list filter (`mapping_parser.py:56-82` OR-chain; chunked
    at 200 ids in `mriya.py:63-68`). Above 10k ids this op switches to
    a broadcast semi-join (see ops.relational.filter_isin)."""
    from mriya_spark.ops.relational import filter_isin, project

    df = _cat(spark, sf_dir).table("customer")
    return project(
        filter_isin(df, "c_custkey", _ISIN_KEYS),
        ["c_custkey", "c_name", "c_mktsegment"],
    )


# ---------------------------------------------------------------------------
# §2.5 limits / sorts
# ---------------------------------------------------------------------------

@register(
    "limit_rows",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 10000
    """,
)
def limit_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — LIMIT 10000 (`mapping_parser.py:5`). Sorted first so the
    surviving row set is deterministic for the oracle; Spark plans this
    as TakeOrderedAndProject (per-partition top-k, no global sort)."""
    from mriya_spark.ops.relational import top_k

    df = _cat(spark, sf_dir).table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return top_k(df, [F.col("l_orderkey"), F.col("l_linenumber")], 10_000)


@register(
    "orderby_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def orderby_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 — global top-k (absent in reference; declared surface)."""
    from mriya_spark.ops.relational import top_k

    df = _cat(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return top_k(df, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 100)


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@register(
    "join_lookup",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — FK parent-relationship lookup join (`mapping_parser.py:34-36`
    dotted ``Parent.Field``). Broadcast hash join on the dimension."""
    from mriya_spark.ops.relational import lookup_join

    cat = _cat(spark, sf_dir)
    child = cat.table("customer").select("c_custkey", "c_name", "c_nationkey")
    parent = cat.table("nation")
    out = lookup_join(
        child,
        parent,
        on=child["c_nationkey"] == parent["n_nationkey"],
        fields={"nation_name": parent["n_name"]},
    )
    return out.select("c_custkey", "c_name", "nation_name")


@register(
    "join_semi",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
    """,
)
def join_semi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — semi-join (reference: 200-id chunked IN-list probes,
    `mriya.py:62-77`; one left_semi join here)."""
    from mriya_spark.ops.relational import semi_join

    cat = _cat(spark, sf_dir)
    rich = (
        cat.table("customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return semi_join(
        cat.table("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        rich,
        on="o_custkey",
    )


@register(
    "join_anti",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
    """,
)
def join_anti_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — anti-join ("skip deletion" complement, `mriya.py:71-76`)."""
    from mriya_spark.ops.relational import anti_join

    cat = _cat(spark, sf_dir)
    rich = (
        cat.table("customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return anti_join(
        cat.table("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        rich,
        on="o_custkey",
    )


@register(
    "join_backfill",
    """
    SELECT s.c_custkey,
           c.dst_id AS backfilled_dst_id
    FROM customer s
    INNER JOIN (
        SELECT c_custkey AS old_record_id,
               'DST-' || CAST(c_custkey AS VARCHAR) AS dst_id
        FROM customer WHERE c_acctbal > 0
    ) c ON s.c_custkey = c.old_record_id
    """,
)
def join_backfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — key-backfill equi-join (`migration_engine.py:50-68`
    ``src_update``): join the created destination rows back onto the
    source and emit (src key, new dst id) update rows."""
    from mriya_spark.ops.relational import backfill_join

    cat = _cat(spark, sf_dir)
    src = cat.table("customer")
    created = (
        src.filter(F.col("c_acctbal") > 0)
        .select(
            F.col("c_custkey").alias("old_record_id"),
            F.concat(F.lit("DST-"), F.col("c_custkey").cast("string")).alias(
                "dst_id"
            ),
        )
    )
    return backfill_join(
        src,
        created,
        src_key="c_custkey",
        created_src_key="old_record_id",
        backfill={"backfilled_dst_id": "dst_id"},
    )


@register(
    "join_inner_multi",
    """
    SELECT o.o_orderkey,
           c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, c.c_name
    """,
)
def join_inner_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-ish multi-join + agg (declared general surface). The
    customer side is dimension-ish -> AQE broadcasts it; the
    lineitem-orders join shuffles on orderkey."""
    cat = _cat(spark, sf_dir)
    c = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.table("orders")
    l = cat.table("lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# §2.6 transforms
# ---------------------------------------------------------------------------

@register(
    "transform_rename",
    """
    SELECT c_custkey AS old_record_id, c_name AS name,
           c_acctbal AS acctbal, c_mktsegment AS segment
    FROM customer
    """,
)
def transform_rename_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — rename-projection (`migration_engine.py:25-35`)."""
    from mriya_spark.ops.transform import rename_columns

    return rename_columns(
        _cat(spark, sf_dir).table("customer"),
        {
            "old_record_id": "c_custkey",
            "name": "c_name",
            "acctbal": "c_acctbal",
            "segment": "c_mktsegment",
        },
    )


@register(
    "transform_lit",
    """
    SELECT c_custkey AS old_record_id, c_name AS name,
           'ACME-HOLDING' AS company_name, 'customer_dst' AS type
    FROM customer
    """,
)
def transform_lit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — constant column injection (`migration_engine.py:39-41`:
    hard-coded ``Company_Name__c`` FK + object-name ``type`` key)."""
    from mriya_spark.ops.transform import transform_pipeline

    return transform_pipeline(
        _cat(spark, sf_dir).table("customer"),
        rename={"old_record_id": "c_custkey", "name": "c_name"},
        constants={"company_name": "ACME-HOLDING", "type": "customer_dst"},
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

@register("agg_count", "SELECT COUNT(*) AS n_rows FROM lineitem")
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — total count (`data_connector.py:59` result size)."""
    from mriya_spark.ops.aggregate import count_rows

    return count_rows(_cat(spark, sf_dir).table("lineitem"))


@register(
    "agg_filtered_count",
    """
    SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_success,
           COUNT(*) AS n_total
    FROM events
    """,
)
def agg_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — success-ratio count (`project_utils.py:38-46`): one pass,
    conditional sum + total."""
    from mriya_spark.ops.aggregate import filtered_count

    return filtered_count(
        _cat(spark, sf_dir).table("events"), F.col("event_type") == "purchase"
    )


@register(
    "agg_groupby",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (declared §2.4 general surface).

    Map-side partial aggregation + 2-key shuffle; the canonical bench
    headline query."""
    df = _cat(spark, sf_dir).table("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# flagship: the migration pipeline as one query (SURVEY §3 stages 6-10)
# ---------------------------------------------------------------------------

FLAGSHIP_MAPPING = {
    "source_object": "customer",
    "destination_object": "customer_dst",
    "where_condition": "c_acctbal > 0",
    "mapping": [
        {
            "table_src": "customer",
            "column_src": "c_custkey",
            "table_dst": "customer_dst",
            "column_dst": "old_record_id",
            "operation": "upd_src",
            "column_type": "src_id",
        },
        {
            "table_src": "customer",
            "column_src": "c_name",
            "table_dst": "customer_dst",
            "column_dst": "name",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "customer",
            "column_src": "c_acctbal",
            "table_dst": "customer_dst",
            "column_dst": "acctbal",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "customer",
            "column_src": "c_mktsegment",
            "table_dst": "customer_dst",
            "column_dst": "segment",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "nation",
            "column_src": "n_name",
            "table_dst": "customer_dst",
            "column_dst": "nation_name",
            "operation": "insert",
            "column_type": "regular",
        },
    ],
    "lookups": {
        "nation": {"table": "nation", "src_fk": "c_nationkey", "parent_key": "n_nationkey"}
    },
}


def run_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole pipeline (`/root/reference/mriya.py` stages
    6-10) as one lazy DAG: extract (scan+lookup+where+prune) ->
    transform (rename+lit) -> "load" (materialize dst ids) -> backfill
    join. Returns the loaded destination table joined with its backfill
    state — every row proves extract/transform/load/backfill agree.
    """
    from mriya_spark.mapping import MappingSpec

    cat = Catalog(spark, sf_dir)
    spec = MappingSpec.from_obj(FLAGSHIP_MAPPING)
    extracted = spec.extract(cat)
    dst = spec.transform(extracted, constants={"company_name": "ACME-HOLDING"})
    # "load": destination assigns ids; deterministic surrogate here
    created = dst.withColumn(
        "dst_id", F.concat(F.lit("DST-"), F.col("old_record_id").cast("string"))
    )
    backfilled = spec.backfill(cat.table("customer"), created)
    # final state: destination rows + the src-side backfill confirmation
    return created.join(
        backfilled.select(
            F.col("c_custkey").alias("old_record_id"),
            F.col("c_custkey_dst_id").alias("src_backfilled_id"),
        ),
        on="old_record_id",
        how="left",
    )


@register(
    "migration_pipeline",
    """
    SELECT c.c_custkey AS old_record_id,
           c.c_name AS name,
           c.c_acctbal AS acctbal,
           c.c_mktsegment AS segment,
           n.n_name AS nation_name,
           'ACME-HOLDING' AS company_name,
           'DST-' || CAST(c.c_custkey AS VARCHAR) AS dst_id,
           'DST-' || CAST(c.c_custkey AS VARCHAR) AS src_backfilled_id
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 0
    """,
)
def migration_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_migration(spark, sf_dir)
