"""DuckDB-native output-type audit for every oracle in the registry.

The r6/r7 ``window_running`` red row was caused by an oracle emitting
HUGEINT (DuckDB widens un-cast integer window SUMs to int128). pandas
coerces HUGEINT cells to plain Python ints, so the pandas-level dtype
audit (``tools/check_dtypes.py``) cannot see the difference — but the
driver's canonicalizer can. This tool therefore asks DuckDB itself for
the declared result type of each oracle column (via ``LIMIT 0`` +
cursor description) and flags any type outside the engine-native
primitive set the registry's hash-safety rule allows
(``mriya_spark/queries.py:10-11``): BIGINT/INTEGER/SMALLINT/TINYINT,
DOUBLE/FLOAT, VARCHAR, BOOLEAN, DATE, TIMESTAMP, BLOB — PRIMITIVES
ONLY. LIST/ARRAY/MAP/STRUCT outputs are REJECTED: the r11 official
gate proved the driver's canonicalizer crashes on array cells
(pandas ``sort_values`` → ``TypeError: unhashable type: 'list'``,
`tokenizer_bpe_pack` CORRECTNESS_r11) — an earlier revision of this
tool whitelisted "LIST/ARRAY thereof" on the now-disproven claim
that the driver handles them. Serialize sequences to VARCHAR
(``array_join`` / ``array_to_string``) instead.

Usage: python tools/check_oracle_types.py [--sf DIR] [names...]
Exit status 1 if any oracle declares a widened type.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Primitive types the driver's canonicalizer PROVABLY handles (r11:
# anything nested — LIST/ARRAY/MAP/STRUCT — crashes its sort_values).
_OK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "BLOB",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS",
}


def bad_types(coltypes: list[tuple[str, str]]) -> list[tuple[str, str]]:
    out = []
    for name, t in coltypes:
        base = t.strip().upper()
        # no unwrapping: DOUBLE[] / BIGINT[8] / MAP(...) / STRUCT(...)
        # all fail — the driver cannot canonicalize nested cells
        if base not in _OK:
            out.append((name, t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    names = args.names or list(oracles)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    n_bad = 0
    for name in names:
        sql = oracles.get(name)
        if not sql:
            continue
        try:
            rel = con.sql(sql)
            coltypes = list(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"{name}: ERROR {e}")
            n_bad += 1
            continue
        bad = bad_types(coltypes)
        if bad:
            n_bad += 1
            print(f"{name}: WIDENED {bad}")
    print(f"audited {sum(1 for n in names if oracles.get(n))} oracles, "
          f"{n_bad} with widened/erroring output types")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
