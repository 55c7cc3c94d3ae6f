"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale-factor dir
(default sf0.01) AND its DuckDB ``oracle_sql()`` twin, then compares:
row count, column names, and an order-insensitive canonical value hash
(columns sorted by name, rows sorted, floats rounded to 9 significant
digits, timestamps normalized to microseconds).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canonical_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash, canonicalized the DRIVER's way.

    The driver row-sorts with pandas ``DataFrame.sort_values`` over all
    columns (name-sorted) BEFORE hashing — which raises ``TypeError:
    unhashable type`` on array/map/struct cells. The r11 replica
    stringified list cells instead, so the replica said green where the
    driver said red (`tokenizer_bpe_pack`, CORRECTNESS_r11). Now the
    replica performs the same ``sort_values`` first, so any output the
    driver cannot canonicalize crashes HERE first (replica-green implies
    driver-green again); the hash itself stays the validated
    string-normalized form (row-order-insensitive, so the extra sort
    does not change any previously-green hash).
    """
    df = df[sorted(df.columns)].copy()
    if len(df.columns) and len(df):
        # driver-parity guard: crashes on unhashable (array/map/struct)
        # cells exactly like the driver's canonicalizer
        df = df.sort_values(list(df.columns), kind="stable")

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.9g}"
        if isinstance(v, pd.Timestamp):
            return v.floor("us").isoformat()
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = sorted(
        "|".join(norm(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows, {spark_t:.1f}s) [no oracle]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            hs, ho = canonical_hash(sdf), canonical_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} vs {ho}")
        if problems:
            n_fail += 1
            print(f"{name}: MISMATCH — {'; '.join(problems)}")
        else:
            print(f"{name}: OK ({len(sdf)} rows, {spark_t:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
