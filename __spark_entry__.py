"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mriya_spark`` (see SURVEY.md §7); this file
just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mriya_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full migration pipeline
    (`/root/reference/mriya.py` stages 6-10) as one lazy DataFrame DAG
    over sf0.001 — extract (scan + broadcast lookup join + WHERE +
    pruning) → transform (rename + literal injection) → load (dst id
    assignment) → key-backfill join."""
    return _registry.run_migration(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return _registry.oracle_sql()
