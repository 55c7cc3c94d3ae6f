"""Mapping DSL: the reference's JSON mapping document -> DataFrame plans.

The mapping document is the reference engine's "program"
(`/root/reference/mapping_parser.py:8-25`): a list of 6-tuples
``(table_src, column_src, table_dst, column_dst, operation,
column_type)`` under ``{source_object, destination_object,
where_condition, mapping}``. The reference compiles it to SOQL strings
(`mapping_parser.py:31-41`) and applies it with driver-side dict loops
(`/root/reference/migration_engine.py:19-68`).

Here the same document compiles to a lazy DataFrame DAG:

- ``extract``   — scan + lookup-joins + WHERE + column pruning
                  (replaces ``get_src_soql``, `mapping_parser.py:31-41`)
- ``transform`` — rename-projection + constant injection
                  (replaces ``dst_update`` rows loop,
                  `migration_engine.py:25-41`)
- ``backfill``  — join created dst rows back onto src keys
                  (replaces ``src_update``, `migration_engine.py:50-68`)

Known reference bugs NOT replicated (SURVEY.md §7 "What's hard"):
``get_dst_old_id_column`` returning the src column
(`mapping_parser.py:144-147`) and ``get_dst_soql_cond`` querying the
source object (`mapping_parser.py:77`) — we implement the documented
intent.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mriya_spark.ops.relational import backfill_join, filter_expr

if TYPE_CHECKING:
    from mriya_spark.catalog import Catalog

VALID_COLUMN_TYPES = {"regular", "src_id", "dst_id"}

#: SOQL-only constructs a real Salesforce mapping may contain. The
#: reference splices ``where_condition`` into SOQL verbatim
#: (`mapping_parser.py:21,39-40`); this engine takes ANSI/Spark-SQL
#: expressions instead (documented deviation, `ops/relational.py`
#: ``filter_expr``). Most SOQL date literals are *syntactically* valid
#: ANSI (``TODAY`` parses as a column), so without this check a pasted
#: SOQL mapping only fails deep in the analyzer with an unresolved-
#: column error — detect the known constructs up front and say how to
#: rewrite them.
_SOQL_ONLY = re.compile(
    r"""(?ix)
    \b(?:
        (?:LAST|NEXT)_N_(?:DAYS|WEEKS|MONTHS|QUARTERS|YEARS)\s*:\s*\d+
      | (?:LAST|NEXT)_90_DAYS
      | (?:THIS|LAST|NEXT)_(?:WEEK|MONTH|QUARTER|YEAR|FISCAL_QUARTER|FISCAL_YEAR)
      | TODAY | YESTERDAY | TOMORROW
      | INCLUDES\s*\( | EXCLUDES\s*\(
    )""",
)


def validate_where_condition(cond: str) -> None:
    """Fail fast on a ``where_condition`` this engine cannot run.

    Two layers, both at mapping-load time rather than mid-pipeline:
    known SOQL-only constructs get a targeted message (rewrite hints),
    and — when a SparkSession is already active — the expression is run
    through Spark's SQL parser so plain syntax errors surface with the
    mapping context attached instead of from a later ``filter_expr``.
    """
    if not cond:
        return
    # mask string literals first: a constant like c_status = 'TOMORROW'
    # is valid ANSI and must not trip the SOQL detector
    unquoted = re.sub(r"'(?:[^'\\]|\\.)*'", "''", cond)
    m = _SOQL_ONLY.search(unquoted)
    if m:
        raise ValueError(
            f"where_condition {cond!r} uses the SOQL-only construct "
            f"{m.group(0)!r}; this engine takes ANSI/Spark-SQL expressions "
            "(e.g. TODAY -> current_date(), LAST_N_DAYS:7 -> "
            "date_sub(current_date(), 7), INCLUDES(x) -> "
            "array_contains(split(col, ';'), 'x'))"
        )
    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    try:
        # parser-only (F.expr is lazy in PySpark 4); unresolved columns
        # still surface later, at analysis
        parser = spark._jsparkSession.sessionState().sqlParser()
    except Exception:
        # no JVM-side parser on this session flavor (e.g. Spark
        # Connect) — skip the syntax pre-check, don't misreport an
        # environment gap as a SQL error
        return
    try:
        parser.parseExpression(cond)
    except Exception as e:
        first = next((ln for ln in str(e).splitlines() if ln.strip()), repr(e))
        raise ValueError(
            f"where_condition {cond!r} is not a valid Spark SQL "
            f"expression: {first}"
        ) from None


@dataclass(frozen=True)
class MappingRule:
    """One mapping element (`mapping_parser.py:8-10` ``MappingElement``)."""

    table_src: str
    column_src: str
    table_dst: str
    column_dst: str
    operation: str = "insert"
    column_type: str = "regular"

    def __post_init__(self) -> None:
        if self.column_type not in VALID_COLUMN_TYPES:
            raise ValueError(f"invalid column_type: {self.column_type!r}")


@dataclass
class LookupSpec:
    """How a foreign table referenced by a rule joins to the source.

    The reference expresses this as a dotted SOQL parent-relationship
    field (`mapping_parser.py:34-36`) and lets Salesforce join; we need
    the FK spelled out: ``src_fk`` on the source == ``parent_key`` on
    the parent table.
    """

    table: str
    src_fk: str
    parent_key: str


class MappingSpec:
    """Parsed mapping document + plan builders."""

    def __init__(
        self,
        source_object: str,
        destination_object: str,
        where_condition: str,
        rules: list[MappingRule],
        lookups: dict[str, LookupSpec] | None = None,
        parent_fks: dict[str, str] | None = None,
    ):
        if not rules:
            # same contract as the reference (`mapping_parser.py:15-17`)
            raise ValueError("mapping must be non-empty")
        validate_where_condition(where_condition)
        self.source_object = source_object
        self.destination_object = destination_object
        self.where_condition = where_condition
        self.rules = rules
        self.lookups = lookups or {}
        #: FK dependencies on OTHER mapping-array elements:
        #: ``{column_src holding the parent key: parent source_object}``.
        #: Distinct from ``lookups`` (read-side joins against existing
        #: tables): a parent_fk points at an object that is itself being
        #: migrated, so the value must be REWRITTEN to the parent's
        #: freshly created dst id (``run_mapping_array``).
        self.parent_fks = dict(parent_fks or {})
        src_id_dst = next(
            (r.column_dst for r in rules if r.column_type == "src_id"), None
        )
        for fk_col in self.parent_fks:
            # exactly ONE transform-surviving rule must carry the FK:
            # zero means nothing to rewrite; dst_id-typed rules never
            # reach the output (transform drops them), so counting one
            # would fail later with an opaque unresolved-column error;
            # src_id-typed rules (and any rule landing on the src_id
            # rule's column_dst) are the row's OWN key carrier — the
            # rewrite would overwrite it with the parent's dst id
            # before this object derives its own dst_id and backfill
            # join, garbling ids with no load-time error (r10 advice);
            # several is ambiguous (which dst column holds the parent
            # reference to rewrite?) — all are mapping-document errors
            # and fail HERE, at load time (r10 review)
            carriers = [
                r
                for r in rules
                if r.column_src == fk_col
                and r.column_type not in ("dst_id", "src_id")
                and r.column_dst != src_id_dst
            ]
            if len(carriers) != 1:
                raise ValueError(
                    f"parent_fks references {fk_col!r}, which must be "
                    f"carried by exactly one mapping rule that is "
                    f"neither dst_id- nor src_id-typed nor aliased onto "
                    f"the src_id rule's destination column "
                    f"(found {len(carriers)}); split the mapping if a "
                    "second copy of the old parent key is wanted"
                )

    # -- parsing ---------------------------------------------------------
    @classmethod
    def from_obj(cls, obj: dict) -> "MappingSpec":
        rules = [
            MappingRule(
                table_src=m["table_src"],
                column_src=m["column_src"],
                table_dst=m["table_dst"],
                column_dst=m["column_dst"],
                operation=m.get("operation", "insert"),
                column_type=m.get("column_type", "regular"),
            )
            for m in obj.get("mapping", [])
        ]
        lookups = {
            name: LookupSpec(
                table=lk["table"],
                src_fk=lk["src_fk"],
                parent_key=lk["parent_key"],
            )
            for name, lk in obj.get("lookups", {}).items()
        }
        return cls(
            source_object=obj["source_object"],
            destination_object=obj["destination_object"],
            where_condition=obj.get("where_condition", ""),
            rules=rules,
            lookups=lookups,
            parent_fks=obj.get("parent_fks", {}),
        )

    @classmethod
    def load(cls, path_or_json: str, index: int = 0) -> "MappingSpec":
        """Load from a JSON file (array of specs; v0 used ``[0]``,
        `/root/reference/mriya.py:20`)."""
        if path_or_json.lstrip().startswith("["):
            arr = json.loads(path_or_json)
        else:
            with open(path_or_json) as f:
                arr = json.load(f)
        return cls.from_obj(arr[index])

    # -- rule views (replaces P6 metadata filters,
    #    `mapping_parser.py:59,66,92,98,127-132`) -------------------------
    @property
    def regular_rules(self) -> list[MappingRule]:
        return [r for r in self.rules if r.column_type == "regular"]

    @property
    def src_id_rule(self) -> MappingRule:
        """The rule carrying the src primary key into the destination
        (``column_type == 'src_id'``, `mapping_parser.py:98,130`)."""
        for r in self.rules:
            if r.column_type == "src_id":
                return r
        raise ValueError("mapping has no src_id rule")

    @property
    def backfill_rules(self) -> list[MappingRule]:
        """Rules written back to the source after load
        (``operation == 'upd_src'``, `mapping_parser.py:127,141`)."""
        return [r for r in self.rules if r.operation == "upd_src"]

    # -- plan builders ---------------------------------------------------
    def extract(self, catalog: "Catalog") -> DataFrame:
        """Replaces ``get_src_soql`` (`mapping_parser.py:31-41`):
        scan the source, resolve lookup (parent-relationship) columns
        via broadcast joins, apply the WHERE pass-through, and prune to
        exactly the mapped columns.
        """
        src = catalog.table(self.source_object)
        if self.where_condition:
            src = filter_expr(src, self.where_condition)

        # Resolve foreign-table rules (reference: dotted Parent.Field,
        # `mapping_parser.py:34-36`) as broadcast lookup joins.
        out_cols = []
        foreign_tables = {}
        for r in self.rules:
            if r.table_src == self.source_object:
                out_cols.append(F.col(r.column_src))
            else:
                foreign_tables.setdefault(r.table_src, []).append(r)

        df = src
        for tname, t_rules in foreign_tables.items():
            lk = self.lookups.get(tname)
            if lk is None:
                raise ValueError(
                    f"rule references foreign table {tname!r} but no lookup "
                    "spec (FK relationship) was provided"
                )
            parent = catalog.table(lk.table)
            needed = {lk.parent_key} | {r.column_src for r in t_rules}
            parent = parent.select(
                *[F.col(c).alias(f"__{tname}__{c}") for c in needed]
            )
            df = df.join(
                F.broadcast(parent),
                df[lk.src_fk] == parent[f"__{tname}__{lk.parent_key}"],
                "left",
            )
            out_cols += [
                F.col(f"__{tname}__{r.column_src}").alias(r.column_src)
                for r in t_rules
            ]
        return df.select(*out_cols)

    def transform(
        self, extracted: DataFrame, constants: dict[str, object] | None = None
    ) -> DataFrame:
        """Replaces the ``dst_update`` row loop (`migration_engine.py:25-41`):
        one rename-projection + literal injection select."""
        cols = [
            F.col(r.column_src).alias(r.column_dst)
            for r in self.rules
            if r.column_type != "dst_id"
        ]
        cols += [F.lit(v).alias(k) for k, v in (constants or {}).items()]
        return extracted.select(*cols)

    def backfill(self, src: DataFrame, created: DataFrame) -> DataFrame:
        """Replaces ``src_update`` (`migration_engine.py:50-68`): join the
        created destination rows back to the source on the src-id
        column and emit the update rows ``(src key, backfilled ids)``.

        ``created`` must contain the dst id column named ``dst_id`` plus
        the src-id carrier column (``src_id_rule.column_dst``).
        """
        sid = self.src_id_rule
        src_key = self._src_key()
        # Output column per upd_src rule: the src column that receives
        # the new dst id. When the rule reuses the src key itself (the
        # reference's conflated shape, FIXTURES.md A2), suffix it so the
        # update row keeps (key, backfilled id) distinct.
        backfill_cols = {
            (r.column_src if r.column_src != src_key else f"{r.column_src}_dst_id"):
                "dst_id"
            for r in self.backfill_rules
        } or {f"{sid.column_src}_dst_id": "dst_id"}
        return backfill_join(
            src,
            created,
            src_key=self._src_key(),
            created_src_key=sid.column_dst,
            backfill=backfill_cols,
        )

    def _src_key(self) -> str:
        """Source primary-key column (the reference uses SF ``Id``;
        here: whatever column the src_id rule reads)."""
        return self.src_id_rule.column_src


# ---------------------------------------------------------------------------
# multi-object orchestration
# ---------------------------------------------------------------------------
#
# The reference's mapping document is a JSON ARRAY of specs
# (`/root/reference/mapping_parser.py:8-25` schema) but v0 only ever runs
# element [0] (`/root/reference/mriya.py:20`). The product shape it was
# growing toward — and what any real Salesforce migration needs — is to
# run EVERY element, parents before the children that reference them,
# with each child's FK columns rewritten from old parent keys to the
# parent's freshly created destination ids. That is what
# ``migration_order`` + ``run_mapping_array`` provide.


def migration_order(specs: list[MappingSpec]) -> list[MappingSpec]:
    """Topologically order mapping specs by ``parent_fks`` dependencies
    (Kahn's algorithm; stable — array order breaks ties, so an already-
    ordered document is untouched). A parent_fk naming an object not in
    the array, or a dependency cycle, is a mapping-document error and
    fails at plan-build time, not mid-migration."""
    by_src = {s.source_object: s for s in specs}
    if len(by_src) != len(specs):
        raise ValueError("duplicate source_object in mapping array")
    deps: dict[str, set[str]] = {}
    for s in specs:
        parents = set(s.parent_fks.values())
        missing = parents - set(by_src)
        if missing:
            raise ValueError(
                f"mapping for {s.source_object!r} references parent "
                f"object(s) {sorted(missing)} not present in the array"
            )
        deps[s.source_object] = parents
    ordered: list[MappingSpec] = []
    done: set[str] = set()
    pending = list(specs)
    while pending:
        ready = [s for s in pending if deps[s.source_object] <= done]
        if not ready:
            cyc = sorted(s.source_object for s in pending)
            raise ValueError(f"parent_fks dependency cycle among {cyc}")
        for s in ready:
            ordered.append(s)
            done.add(s.source_object)
        pending = [s for s in pending if s.source_object not in done]
    return ordered


def run_mapping_array(
    catalog: "Catalog",
    specs: list[MappingSpec],
    *,
    constants: dict[str, dict[str, object]] | None = None,
    broadcast_parents: bool = True,
) -> dict[str, DataFrame]:
    """Run every mapping-array element in FK dependency order; returns
    ``{source_object: created destination DataFrame}`` where each
    created frame carries its payload columns plus ``dst_id``.

    Per object: ``extract`` -> ``transform`` -> parent-FK rewrite ->
    "load" (deterministic surrogate dst ids, ``{destination_object}-
    {src key}`` — the same stand-in ``run_migration`` uses for the
    org-assigned id). A child's FK rewrite is ONE equi-join per parent
    against that parent's (src key -> dst_id) projection — broadcast by
    default (migration parents are dimension-sized relative to their
    children; pass ``broadcast_parents=False`` at genuinely large
    parent cardinality and let AQE pick the strategy). The join is LEFT:
    an orphan FK (child row pointing at a parent key that was filtered
    out or never existed) surfaces as a NULL new id rather than
    silently dropping the child row — the caller decides whether that
    is a data-quality failure.

    Everything stays one lazy DAG per object; nothing is collected.
    The whole array compiles before anything runs, so a bad document
    (cycle, missing parent, FK column not mapped) fails fast.
    """
    order = migration_order(specs)
    created: dict[str, DataFrame] = {}
    consts = constants or {}
    for spec in order:
        extracted = spec.extract(catalog)
        dst = spec.transform(
            extracted, constants=consts.get(spec.source_object)
        )
        for fk_col_src, parent_obj in spec.parent_fks.items():
            parent_spec = next(
                s for s in order if s.source_object == parent_obj
            )
            # unique by the __init__ validation (exactly one carrier
            # per parent_fks column that is neither dst_id- nor
            # src_id-typed nor aliased onto the src_id destination)
            p_sid = parent_spec.src_id_rule
            sid_dst = spec.src_id_rule.column_dst
            rule = next(
                r
                for r in spec.rules
                if r.column_src == fk_col_src
                and r.column_type not in ("dst_id", "src_id")
                and r.column_dst != sid_dst
            )
            lookup = created[parent_obj].select(
                F.col(p_sid.column_dst).alias("__p_key"),
                F.col("dst_id").alias(rule.column_dst),
            )
            if broadcast_parents:
                lookup = F.broadcast(lookup)
            dst = (
                dst.withColumnRenamed(rule.column_dst, "__old_fk")
                .join(lookup, F.col("__old_fk") == F.col("__p_key"), "left")
                .drop("__old_fk", "__p_key")
            )
        sid = spec.src_id_rule
        created[spec.source_object] = dst.withColumn(
            "dst_id",
            F.concat(
                F.lit(spec.destination_object + "-"),
                F.col(sid.column_dst).cast("string"),
            ),
        )
    return created
