"""Strict dtype audit vs the driver's canonicalizer.

The driver's correctness gate (unlike tools/check_oracle.py) does NOT
int-normalize float cells — a Spark BIGINT 5 vs a DuckDB DOUBLE 5.0
hash-mismatches even though the values agree (the round-2 math_funcs
failure). This tool runs each query + oracle at sf0.01 and flags any
column whose pandas dtype differs between the two sides, plus any
object-typed cell that isn't a plain scalar (lists crash the driver's
row sort).

Usage: python tools/check_dtypes.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def kind(dtype, series) -> str:
    """Collapse dtypes to the equivalence classes the driver's
    str()-based canon distinguishes: int, float, bool, ts, bytes,
    str, list."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    for v in series.dropna().head(20):
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
    return "str"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="check_dtypes")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or [n for n in qs if n in oracles]

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_flag = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_flag += 1
            continue
        problems = []
        for c in sdf.columns:
            if kind(sdf[c].dtype, sdf[c]) == "list":
                problems.append(f"{c}: spark side is list-typed (canon crash)")
        if name in oracles:
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as e:  # noqa: BLE001
                print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
                n_flag += 1
                continue
            for c in sorted(set(sdf.columns) & set(odf.columns)):
                ks, ko = kind(sdf[c].dtype, sdf[c]), kind(odf[c].dtype, odf[c])
                if ks != ko:
                    problems.append(f"{c}: spark {ks} vs oracle {ko}")
        if problems:
            n_flag += 1
            print(f"{name}: FLAG — {'; '.join(problems)}")
        else:
            print(f"{name}: clean")
    print(f"\n{len(names) - n_flag}/{len(names)} clean")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
