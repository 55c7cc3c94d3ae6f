"""Measure multi-pass blocking RECALL under prefix-localized edits
(r14 judge directive 6 — the recall twin of the r14 hot-block-cap
probe's 36× number).

`fuzzy_join_multiblock`'s docstring argues recall from edit positions:
an edit cannot sit in both the first AND last `block_len` characters
of a string longer than 2·block_len, so the prefix+suffix union is
exact under single-sided edits for such strings — and for SHORTER
strings the two windows overlap, so edits landing in the overlap
escape both passes. This probe replaces that argument with numbers.

Fixture: side A = customer names (18 chars — SHORTER than 2·16, the
overlap regime) or names doubled to 37 chars (`name/name` — the
docstring's exact-recall regime); side B = the same string with ONE
substitution at position p = 1 + custkey % 4 (chars 1–4, the
prefix-localized band the directive names). Every (k, k+1e6) pair is
a true dist-1 mate, so recall is exact-countable; found pairs are
broken down by edit position. Predictions the numbers must match:

- prefix pass alone: 0% (every edit is inside the prefix window);
- union, 18-char names: edits at p∈{1,2} sit OUTSIDE the suffix
  window (chars 3–18) and are recovered; p∈{3,4} sit in the overlap
  and escape both passes → recall exactly 50%;
- union, 37-char strings: suffix window = chars 22–37, disjoint from
  chars 1–4 → recall 100%.

Usage: python tools/probe_multiblock_recall.py [--sf DIR ...]
Prints one JSON line per (sf, variant); append the table to SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

BLOCK_LEN = 16
MAX_DIST = 2


def probe(spark, sf_dir: str, variant: str) -> dict:
    from mriya_spark.catalog import Catalog
    from mriya_spark.ops.relational import (
        fuzzy_join_blocked,
        fuzzy_join_multiblock,
    )

    cust = Catalog(spark, sf_dir).table("customer")
    if variant == "short":
        src = cust.select("c_custkey", F.col("c_name").alias("nm"))
    else:  # 'long'/'double': 37 chars > 2*block_len — exact regime
        src = cust.select(
            "c_custkey", F.expr("concat(c_name, '/', c_name)").alias("nm")
        )
    a = src.select("c_custkey", F.col("nm").alias("v"))
    if variant == "double":
        # TWO substitutions, one near each end (p = 1 + custkey % 4
        # and len-1): each classic window contains one edit site, so
        # the pair escapes BOTH the prefix and suffix passes — the
        # middle pass's unique recovery (r15 `passes=` extension)
        b = src.select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            F.expr(
                "concat(substr(nm, 1, c_custkey % 4), 'x', "
                "substr(nm, c_custkey % 4 + 2, "
                "length(nm) - (c_custkey % 4 + 2) - 1), 'x', "
                "substr(nm, length(nm)))"
            ).alias("v"),
        )
    else:
        # one substitution at position p = 1 + custkey % 4 (chars 1-4)
        b = src.select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            F.expr(
                "concat(substr(nm, 1, c_custkey % 4), 'x', "
                "substr(nm, c_custkey % 4 + 2))"
            ).alias("v"),
        )
    n_true = src.count()
    out = {"sf": sf_dir, "variant": variant, "n_true_mates": n_true}
    modes = [
        ("prefix_only", fuzzy_join_blocked, {}),
        ("union", fuzzy_join_multiblock, {}),
    ]
    if variant == "double":
        modes.append((
            "union3",
            fuzzy_join_multiblock,
            {"passes": ("prefix", "suffix", "middle")},
        ))
    for label, fn, extra in modes:
        t0 = time.monotonic()
        pairs = fn(
            a, b, col="v", id_col="c_custkey",
            max_dist=MAX_DIST, block_len=BLOCK_LEN, **extra,
        ).cache()
        mates = pairs.filter(
            F.col("id_b") - 1_000_000 == F.col("id_a")
        )
        by_pos = {
            int(r["p"]): int(r["n"])
            for r in mates.groupBy(
                (F.col("id_a") % 4 + 1).alias("p")
            ).agg(F.count("*").alias("n")).collect()
        }
        found = sum(by_pos.values())
        out[label] = {
            "found": found,
            "recall": round(found / n_true, 4),
            "by_edit_pos": {str(k): by_pos.get(k, 0) for k in (1, 2, 3, 4)},
            "total_pairs": pairs.count(),
            "sec": round(time.monotonic() - t0, 2),
        }
        pairs.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        nargs="*",
        default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    )
    args = ap.parse_args()
    from mriya_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in args.sf:
        for variant in ("short", "long", "double"):
            print(json.dumps(probe(spark, sf_dir, variant)))


if __name__ == "__main__":
    main()
