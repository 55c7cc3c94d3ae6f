"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``mriya_spark`` (see SURVEY.md §7). This
module re-exports the registry and applies one piece of harness
policy: the driver's gate records a capped number of entries per
round, so ``queries()``/``oracle_sql()`` yield the registry ordered
by official-record staleness — never-recorded, rows-only-upgraded,
and MATERIALLY CHANGED queries first (change = the GATE_DIGESTS.json
sidecar's oracle+bytecode digest moved after the query's newest
official row — r10 judge directive 2, so a green row describing
retired code never lets an edited query coast), then regressed, then
stalest-green; rows-only-BY-DESIGN queries rotate last (directive 7:
their official rows are weak rows-only checks and each has a
hash-green portable twin, so capped slots go to hash-checkable rows).
That ordering is a property of THIS driver contract, not of the
library — ``mriya_spark.queries.queries()`` returns plain
registration order.
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


def _gate_history(
    root: Path | None = None,
) -> dict[str, tuple[int, int, bool]]:
    """Per-query official-gate record, read from CORRECTNESS_r*.json.

    Files are processed in ascending NUMERIC round order (``r10`` after
    ``r9``, not lexicographic), and within that order the newest row
    wins outright: a green row records tier 2, a failed row (hash
    mismatch, schema mismatch, canonicalizer crash) records tier 1 —
    so a query that regressed after an earlier green is demoted to the
    failed tier, and a query that recovered after a failure is
    promoted. Queries never recorded default to tier 0 at sort time.
    If no history files are readable (fresh checkout), everything ties
    at "never recorded" and registration order falls out.

    Returns ``{name: (tier, round, rows_only)}`` with tier 1 = newest
    row failed, 2 = newest row green; ``rows_only`` marks a green row
    that was recorded without an oracle (``err == "no_oracle"``) — the
    sort treats such a query as never-recorded once it GAINS an oracle,
    so an upgraded query's first hash-checked row lands promptly.
    """
    if root is None:
        root = Path(__file__).resolve().parent
    rounds: list[tuple[int, Path]] = []
    for path in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            rounds.append((int(m.group(1)), path))
    history: dict[str, tuple[int, int, bool]] = {}
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
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            green = row.get("hash_match") is True or rows_only
            history[name] = (2 if green else 1, rnd, rows_only and green)
    return history


def _gate_digests(root: Path | None = None) -> dict[str, dict]:
    """The GATE_DIGESTS.json sidecar (``tools/update_gate_digests.py``):
    ``{name: {"digest": md5(oracle_sql), "since": round}}``. Missing or
    unreadable → empty (fresh checkout: no re-prioritization)."""
    if root is None:
        root = Path(__file__).resolve().parent
    try:
        doc = json.loads((root / "GATE_DIGESTS.json").read_text())
    except (OSError, ValueError):
        return {}
    return doc if isinstance(doc, dict) else {}


def _query_digest(fn: Callable, oracle: str | None) -> str:
    """Identity of a query's CURRENT form: md5 of its oracle SQL plus
    the registered function's bytecode (``co_code``) AND its constants
    (``co_consts``, recursing into nested code objects) — r11 ADVICE:
    ``co_code`` alone is identical across constant-only edits (a
    max_batch / bucket-count / threshold tweak), which is exactly the
    materially-changed class the sidecar exists to re-prioritize. The
    registered function's own docstring slot is skipped, so prose
    edits still don't burn gate slots.

    r12 judge directive 6: MODULE-LEVEL data constants the function
    reads via ``LOAD_GLOBAL`` (``_ISIN_KEYS``, ``_BPE_MERGES``) live
    in neither co_code nor co_consts — before r13 they were covered
    only when they also fed the oracle f-string, so a Spark-side-only
    module-constant edit could coast on a green row describing retired
    values. The digest now also folds in every DATA global the
    function (or a nested code object) names: each ``co_names`` entry
    resolved through ``fn.__globals__``, keeping only non-callable,
    non-module, non-class values (functions/ops/modules are shared
    code, out of scope by design), hashed as ``name=value`` in sorted
    name order. Values hash via the same deterministic ``nrepr``
    (sets sorted, dicts by sorted key, non-literal objects by TYPE
    name only — never ``repr`` with a memory address).

    Boundaries, stated honestly: (1) an edit to a SHARED op the
    function calls does not change its digest — those edits re-verify
    via tests/tri-SF sweeps, not gate re-priority; (2) a docstring
    edit on a NESTED def (e.g. an inner pandas UDF) DOES change the
    digest — no runtime-reliable way to identify nested docstring
    slots, and one wasted slot beats a missed constant edit; (3)
    frozenset/set constants hash in sorted order (set iteration order
    is hash-seed-dependent across processes); (4) attribute reads on
    a global object (``cfg.limit``) digest the object's type name,
    not the attribute value — no such pattern exists in the registry
    (module constants are flat names); (5) ``co_names`` also contains
    ATTRIBUTE/method names (LOAD_ATTR shares the table with
    LOAD_GLOBAL), so a module-level data constant whose name collides
    with an attribute the function happens to use folds in even if
    never loaded as a global — the failure mode is one SPURIOUS
    re-record when that unrelated constant is edited (a wasted slot,
    never a missed change; r13 ADVICE accepted: filter via ``dis`` to
    true LOAD_GLOBAL names only if such a collision ever appears —
    none exists in the registry today); (6) a NON-LITERAL data global
    (e.g. a numpy weights array) hashes by type name only, so edits
    to its VALUES don't move the digest — registry data constants are
    plain lists/tuples/dicts/scalars by convention for exactly this
    reason. A Python-version bump changes co_code wholesale; the
    registry would then re-record over following rounds and
    self-heal.

    Decorated queries (``caching.scoped_build`` wraps a build in a
    ``cache_scope``) digest their UNWRAPPED function (r20): the
    wrapper's co_code is one shared shim, so digesting it would (a)
    blind the sidecar to Spark-side edits of the real body and (b)
    spuriously re-record every gate the day the decorator lands.
    ``inspect.unwrap`` follows the ``functools.wraps`` chain."""
    import hashlib
    import inspect
    import types

    fn = inspect.unwrap(fn)
    h = hashlib.md5()
    if oracle is not None:
        h.update(oracle.encode("utf-8"))

    def nrepr(c) -> str:
        if isinstance(c, (frozenset, set)):
            return "{" + ",".join(sorted(map(nrepr, c))) + "}"
        if isinstance(c, tuple):
            return "(" + ",".join(nrepr(x) for x in c) + ")"
        if isinstance(c, list):
            return "[" + ",".join(nrepr(x) for x in c) + "]"
        if isinstance(c, dict):
            items = sorted((nrepr(k), nrepr(v)) for k, v in c.items())
            return "{" + ",".join(f"{k}:{v}" for k, v in items) + "}"
        if c is None or isinstance(
            c, (str, bytes, bool, int, float, complex)
        ):
            return repr(c)
        # non-literal object (e.g. a compiled regex, a dataclass):
        # identify by type only — repr() could embed a memory address,
        # which would make the digest differ across processes
        return f"<{type(c).__module__}.{type(c).__qualname__}>"

    names: set[str] = set()

    def upd(code, skip_doc: bool) -> None:
        h.update(code.co_code)
        names.update(code.co_names)
        for i, c in enumerate(code.co_consts):
            if i == 0 and skip_doc and isinstance(c, str):
                continue
            if isinstance(c, types.CodeType):
                upd(c, False)
            else:
                h.update(nrepr(c).encode("utf-8", "backslashreplace"))
            h.update(b"\x00")

    code = getattr(fn, "__code__", None)
    if code is not None:
        upd(code, getattr(fn, "__doc__", None) is not None)
    g = getattr(fn, "__globals__", {})
    for n in sorted(names):
        if n not in g:
            continue  # builtins, attribute names, imported-late names
        if n.startswith("__") and n.endswith("__"):
            # module dunders (__name__, __file__, ...) identify WHERE
            # the function lives, not WHAT it computes — folding them
            # in would make every mechanical module move a spurious
            # re-record (found by the r18 split's safety net: the UDTF
            # gate reads __name__ for its registration string)
            continue
        v = g[n]
        if callable(v) or isinstance(v, (types.ModuleType, type)):
            continue  # shared code/classes: out of scope by design
        h.update(
            f"{n}={nrepr(v)}".encode("utf-8", "backslashreplace")
        )
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _gate_sort_key(
    name: str,
    history: dict[str, tuple[int, int, bool]],
    oracles: dict[str, str],
    reg_index: dict[str, int],
    stored_digests: dict[str, dict],
    live_digests: dict[str, str] | None = None,
    current_round: int = 0,
) -> tuple[int, int, int]:
    rec = history.get(name)
    if rec is None:
        return (0, 0, reg_index[name])
    tier, rnd, rows_only = rec
    side = stored_digests.get(name)
    live = (live_digests or {}).get(name)
    changed = side is not None and (
        (live is not None and side.get("digest") != live)
        or int(side.get("since", 0)) > rnd
    )
    if name in oracles:
        if rows_only:
            # upgraded: its official record predates its oracle — the
            # hash-green flip needs a slot as much as a brand-new query
            return (0, rnd, reg_index[name])
        if changed:
            # materially changed AFTER its newest official row (r10
            # judge directive 2): a green row describing retired code
            # must not let the edited query coast — re-record it in
            # its change round, like a brand-new registration
            return (0, rnd, reg_index[name])
    elif tier == 2:
        if changed:
            # a materially changed rows-only query re-records promptly
            # too — its weak rows-only row still shouldn't describe
            # retired code
            return (0, rnd, reg_index[name])
        # rows-only BY DESIGN and green (r10 judge directive 7): its
        # official row can only ever be a weak rows-only check and
        # every such query has a hash-green portable twin carrying the
        # real evidence — rotate these only after every oracled row is
        # fresher, so capped slots go to hash-checkable rows.
        # ... but never STARVE them (r17 judge directive 6): with a
        # growing registry, "after every oracled row" can mean never.
        # Once the newest record is >= 8 rounds old the no-oracle
        # harness path itself has gone 8 rounds unexercised — its own
        # staleness risk — so the row re-enters the normal green pool
        # at its true age and refreshes in the next gate batch.
        if current_round - rnd >= 8:
            return (2, rnd, reg_index[name])
        return (3, rnd, reg_index[name])
    return (tier, rnd, reg_index[name])


def _gate_order() -> list[str]:
    """Registry names ordered (never-recorded or rows-only-upgraded,
    regressed, stalest-green first); registration order breaks ties."""
    history = _gate_history()
    registry = _registry.queries()
    oracles = _registry.oracle_sql()
    stored = _gate_digests()
    live = {
        n: _query_digest(fn, oracles.get(n)) for n, fn in registry.items()
    }
    reg_index = {n: i for i, n in enumerate(registry)}
    # current round = newest official record + 1 (the round whose gate
    # this ordering will feed); drives only the rows-only
    # anti-starvation re-entry above
    current = max((r for _, r, _ in history.values()), default=0) + 1
    return sorted(
        registry,
        key=lambda n: _gate_sort_key(
            n, history, oracles, reg_index, stored, live, current
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    staleness-first for the capped per-round gate."""
    fns = _registry.queries()
    return {name: fns[name] for name in _gate_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    oracles = _registry.oracle_sql()
    return {name: oracles[name] for name in _gate_order() if name in oracles}
