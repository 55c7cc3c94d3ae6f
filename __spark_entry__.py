"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``mriya_spark`` (see SURVEY.md §7). This
module re-exports the registry and applies one piece of harness
policy: the driver's gate records a capped number of entries per
round, so ``queries()``/``oracle_sql()`` yield the registry ordered
by official-record staleness (never-recorded first, then regressed,
then stalest-green) so coverage rotates and no query's newest
official row goes stale. That ordering is a property of THIS driver
contract, not of the library — ``mriya_spark.queries.queries()``
returns plain registration order.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from mriya_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full migration pipeline
    (`/root/reference/mriya.py` stages 6-10) as one lazy DataFrame DAG
    over sf0.001 — extract (scan + broadcast lookup join + WHERE +
    pruning) → transform (rename + literal injection) → load (dst id
    assignment) → key-backfill join."""
    return _registry.run_migration(spark, "/root/testdata/sf0.001")


def _gate_history(root: Path | None = None) -> dict[str, tuple[int, int]]:
    """Per-query official-gate record, read from CORRECTNESS_r*.json.

    Files are processed in ascending NUMERIC round order (``r10`` after
    ``r9``, not lexicographic), and within that order the newest row
    wins outright: a green row records ``(2, round)``, a failed row
    (hash mismatch, schema mismatch, canonicalizer crash) records
    ``(1, round)`` — so a query that regressed after an earlier green
    is demoted to the failed tier, and a query that recovered after a
    failure is promoted. Queries never recorded default to tier 0 at
    sort time. If no history files are readable (fresh checkout),
    everything ties at "never recorded" and registration order falls
    out.

    Returns ``{name: (tier, round)}`` with tier 1 = newest row failed,
    2 = newest row green.
    """
    if root is None:
        root = Path(__file__).resolve().parent
    rounds: list[tuple[int, Path]] = []
    for path in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            rounds.append((int(m.group(1)), path))
    history: dict[str, tuple[int, int]] = {}
    for rnd, path in sorted(rounds):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            history[name] = (2, rnd) if green else (1, rnd)
    return history


def _gate_order() -> list[str]:
    """Registry names ordered (never-recorded, regressed, stalest-green
    first); registration order breaks ties."""
    history = _gate_history()
    registry = _registry.queries()
    reg_index = {n: i for i, n in enumerate(registry)}

    def key(n: str):
        tier, rnd = history.get(n, (0, 0))
        return (tier, rnd, reg_index[n])

    return sorted(registry, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    staleness-first for the capped per-round gate."""
    fns = _registry.queries()
    return {name: fns[name] for name in _gate_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    oracles = _registry.oracle_sql()
    return {name: oracles[name] for name in _gate_order() if name in oracles}
