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
