"""Row transforms: rename-projection pipelines and literal injection.

The reference's "map" operator is a driver-side Python loop copying
dict keys through a rename map and injecting constants
(`/root/reference/migration_engine.py:19-47`, rename map built at
`/root/reference/mapping_parser.py:114-121`). Spark restatement: a
single ``select`` of aliased/literal column expressions — whole-stage
codegen'd, zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """T1 — rename-projection (`migration_engine.py:25-35`).

    ``mapping`` maps destination column -> source column (the shape of
    the reference's ``dst_update_relations``, `mapping_parser.py:114-121`).
    Output contains exactly the mapped columns, renamed.
    """
    return df.select([F.col(src).alias(dst) for dst, src in mapping.items()])


def with_constants(df: DataFrame, constants: dict[str, object]) -> DataFrame:
    """T2 — constant/default column injection (`migration_engine.py:39-41`).

    Every destination row gets fixed literal values (the reference
    hard-codes an env-specific FK ``Company_Name__c`` and the object
    name). Literals fold into codegen — free at any scale.
    """
    out = df
    for name, value in constants.items():
        col = value if isinstance(value, Column) else F.lit(value)
        out = out.withColumn(name, col)
    return out


def transform_pipeline(
    df: DataFrame,
    rename: dict[str, str],
    constants: dict[str, object] | None = None,
) -> DataFrame:
    """T1+T2 in one select (one projection node in the plan)."""
    cols = [F.col(src).alias(dst) for dst, src in rename.items()]
    for name, value in (constants or {}).items():
        col = value if isinstance(value, Column) else F.lit(value)
        cols.append(col.alias(name))
    return df.select(*cols)


def evolve_to_schema(df: DataFrame, target) -> DataFrame:
    """Conform ``df`` to a target schema — the read-side half of
    schema evolution on a plain-parquet lake (what Delta does with
    metadata, done as one projection):

    - missing columns appear as typed NULLs (parquet mergeSchema
      semantics for files written before the column existed);
    - present columns are cast to the target type (widenings like
      int->long are lossless; narrowing is the caller's intent);
    - extra columns are dropped (projection pruning);
    - output column ORDER is the target's.

    One stage, no shuffle; safe to apply per-file-era in the same
    scan. Reference analogue: the mapping DSL's rename/typed-restore
    surface (`/root/reference/mapping_parser.py:22-25`), which never
    validated agreement between eras.
    """
    from pyspark.sql import types as T

    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    # case-INSENSITIVE match (Spark's own resolution default): a file
    # era that wrote 'CustKey' must conform to target 'custkey', not
    # silently become typed NULLs
    by_lower = {c.lower(): c for c in df.columns}
    cols = []
    for f in target.fields:
        actual = by_lower.get(f.name.lower())
        if actual is not None:
            cols.append(F.col(actual).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
