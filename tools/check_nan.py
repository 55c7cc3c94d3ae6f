"""Float-cell audit: NaN and negative zero, the next two
replica/driver canonicalizer divergence classes — checked while they
are still vacuous.

The local gate replica (``tools/check_oracle.py``) folds float NaN to
"NULL" and (via the integer fold ``str(int(v))``) folds ``-0.0`` to
"0" before hashing — and the two engines can legitimately disagree on
both: Spark produces REAL NaN where DuckDB yields NULL (``0.0/0.0``,
``sqrt(-1)``), and either engine can emit ``-0.0`` where the other
emits ``+0.0`` (``round()`` of a small negative, sums that cancel, a
negated zero) — DuckDB renders it ``'-0.0'`` as VARCHAR, and the
float64 bytes differ. A registered query emitting either would be
replica-green with unknown driver behavior: the exact shape of the r11
array-cell failure (`tokenizer_bpe_pack`), one type class over. This
tool sweeps BOTH engines:

- Spark side: ONE aggregate per float-bearing registered query,
  counting NaN (``isnan``) and negative-zero (``c == 0`` with a
  ``'-'``-prefixed string cast — Java renders ``-0.0`` signed; a
  ``1.0/c`` probe would trip ANSI DIVIDE_BY_ZERO) cells — no full
  materialization.
- Oracle side: each ``oracle_sql()`` runs in DuckDB at the same SF,
  aggregated IN SQL (``isnan`` / ``signbit`` over the subquery) — a
  pandas fetch would fold SQL NULL into float NaN and false-positive
  every nullable float column. The oracle can diverge on its own —
  DuckDB's ``round`` keeps the sign of zero — so Spark-clean alone
  does not close the class.

The fix at the query level: NULL-guard divisions (``nullif``
denominator / ``nanvl``) for NaN; ``+ 0.0`` or ``abs``-at-zero
normalization for negative zero — on BOTH sides.

r12 baseline: 0 NaN and 0 negative-zero cells across all 200 queries
(98 float-bearing) on the Spark side and all value-hash oracles on the
DuckDB side, at sf0.001.

Usage: python tools/check_nan.py [--sf DIR] [--spark-only] [names...]
Exit 1 if any query emits either class on either engine (or errors
while checking).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def spark_float_probes(fcols):
    """Per-column NaN + negative-zero count aggregates (Spark side).

    Negative zero is detected via the string cast (Java renders
    ``-0.0`` with its sign); a ``1.0/c`` sign probe would trip ANSI
    DIVIDE_BY_ZERO on every legitimate +0.0 cell.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in fcols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(F.isnan(col), 1).otherwise(0)).alias(f"nan__{c}")
        )
        aggs.append(
            F.sum(
                F.when(
                    (col == 0) & col.cast("string").startswith("-"), 1
                ).otherwise(0)
            ).alias(f"negz__{c}")
        )
    return aggs


def duckdb_probe_sql(oracle_sql: str, fcols) -> str:
    """NaN + negative-zero count SQL over an oracle subquery.

    Aggregates IN SQL: a pandas fetch would fold SQL NULL into float
    NaN and false-positive every nullable float column (``isnan`` and
    ``signbit`` are NULL-safe in the engine; positional result layout
    is ``nan__0, negz__0, nan__1, ...``).
    """
    probes = []
    for i, c in enumerate(fcols):
        q = '"' + c.replace('"', '""') + '"'
        probes.append(
            f"sum(CASE WHEN isnan({q}) THEN 1 ELSE 0 END) AS nan__{i}"
        )
        probes.append(
            f"sum(CASE WHEN {q} = 0 AND signbit({q}) THEN 1 ELSE 0 END)"
            f" AS negz__{i}"
        )
    return (
        f"SELECT {', '.join(probes)} FROM ({oracle_sql}) __audit__"  # noqa: S608
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--spark-only",
        action="store_true",
        help="skip the DuckDB oracle-side sweep",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql.types import DoubleType, FloatType

    import __spark_entry__ as entry_mod
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="check_nan", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    n_bad = 0
    n_float = 0
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            n_bad += 1
            continue
        try:
            df = fn(spark, args.sf)
            fcols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (DoubleType, FloatType))
            ]
            if not fcols:
                continue
            n_float += 1
            row = df.agg(*spark_float_probes(fcols)).collect()[0]
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        bad_nan = {c: int(row[f"nan__{c}"]) for c in fcols if row[f"nan__{c}"]}
        bad_negz = {
            c: int(row[f"negz__{c}"]) for c in fcols if row[f"negz__{c}"]
        }
        if bad_nan or bad_negz:
            n_bad += 1
            parts = []
            if bad_nan:
                parts.append(f"NaN cells {bad_nan}")
            if bad_negz:
                parts.append(f"negative-zero cells {bad_negz}")
            print(f"{name}: {'; '.join(parts)}")
    print(
        f"spark side: audited {len(names)} queries ({n_float} with float "
        f"outputs), {n_bad} emitting NaN/negative-zero or erroring"
    )

    n_obad = 0
    n_ofloat = 0
    if not args.spark_only:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = f"{args.sf}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        onames = [n for n in names if n in oracles]
        for name in onames:
            try:
                rel = con.sql(oracles[name])
                fcols = [
                    c
                    for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("FLOAT", "DOUBLE", "REAL")
                ]
                if not fcols:
                    continue
                n_ofloat += 1
                row = con.sql(
                    duckdb_probe_sql(oracles[name], fcols)
                ).fetchone()
            except Exception as e:  # noqa: BLE001
                print(f"{name} (oracle): ERROR {type(e).__name__}: {e}")
                n_obad += 1
                continue
            bad_nan, bad_negz = {}, {}
            for i, c in enumerate(fcols):
                nn = int(row[2 * i] or 0)
                nz = int(row[2 * i + 1] or 0)
                if nn:
                    bad_nan[c] = nn
                if nz:
                    bad_negz[c] = nz
            if bad_nan or bad_negz:
                n_obad += 1
                parts = []
                if bad_nan:
                    parts.append(f"NaN cells {bad_nan}")
                if bad_negz:
                    parts.append(f"negative-zero cells {bad_negz}")
                print(f"{name} (oracle): {'; '.join(parts)}")
        print(
            f"oracle side: audited {len(onames)} oracles ({n_ofloat} with "
            f"float outputs), {n_obad} emitting NaN/negative-zero or erroring"
        )

    return 1 if (n_bad or n_obad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
