"""NaN audit: the next replica/driver canonicalizer divergence class.

The local gate replica (``tools/check_oracle.py``) normalizes float
NaN to "NULL" before hashing, and Spark produces REAL NaN where DuckDB
yields NULL (``0.0/0.0``, ``sqrt(-1)``, variance of a single row under
some rewrites) — so a registered query emitting NaN would be
replica-green with unknown driver behavior: the exact shape of the r11
array-cell failure (`tokenizer_bpe_pack`), one type class over. This
tool runs ONE ``isnan``-count aggregate per float-bearing registered
query and fails if any output cell is NaN; the fix at the query level
is a NULL guard (``nullif`` denominator / ``nanvl``) on both sides.

r12 baseline: 0 NaN cells across all 200 queries at sf0.001.

Usage: python tools/check_nan.py [--sf DIR] [names...]
Exit 1 if any query emits NaN (or errors while checking).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    import __spark_entry__ as entry_mod
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="check_nan", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
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
            row = df.agg(
                *[
                    F.sum(
                        F.when(F.isnan(F.col(c)), 1).otherwise(0)
                    ).alias(c)
                    for c in fcols
                ]
            ).collect()[0]
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        bad = {c: int(row[c]) for c in fcols if row[c]}
        if bad:
            n_bad += 1
            print(f"{name}: NaN cells {bad}")
    print(
        f"audited {len(names)} queries ({n_float} with float outputs), "
        f"{n_bad} emitting NaN or erroring"
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
