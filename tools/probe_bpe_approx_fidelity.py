"""Pin `bpe_train_approx` fidelity at a PRODUCTION merge count
(r14 judge directive 7).

The r12 measurement stopped at 64 merges (overlap 50-66% at batch
4/16 on the 31-word documents corpus) — it could not show whether the
stale-count drift COMPOUNDS over the hundreds of rounds a real vocab
takes, which is the envelope a user sizing `batch` actually needs.
This probe runs exact vs approx at >=1k merges on the customer-name
corpus (pretokenizes to 'customer' + one distinct 9-digit word per
row: 1.5k distinct words at sf0.01 — the only fixture vocabulary deep
enough to sustain 1k+ merges; digit-sequence merging is also the
classic number-tokenization stress) and reports, per batch size:

- merge-SET overlap with the exact trainer (order-insensitive — the
  metric the r12 table used);
- downstream token-count drift: total corpus BPE tokens under the
  approx list vs under the exact list (the metric that matters — a
  tokenizer is judged by its segmentation, not its merge-list
  equality);
- driver rounds and wall time (the round-count envelope that
  motivates the approximate trainer at all).

Usage: python tools/probe_bpe_approx_fidelity.py \
         [--sf /root/testdata/sf0.01] [--merges 1000] \
         [--batches 64 256 512]
Prints one JSON line; append the table to SCALE.md.
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


def merge_overlap(exact, approx) -> float:
    """Order-insensitive merge-set overlap: |exact ∩ approx| / |exact|
    over (left, right) pairs (counts excluded — the approx trainer's
    counts are stale by construction)."""
    ex = {(l, r) for l, r, _c in exact}
    ap = {(l, r) for l, r, _c in approx}
    return len(ex & ap) / max(len(ex), 1)


def total_tokens(docs, merges, word_freq) -> int:
    """Total corpus BPE tokens under a merge list: Σ word_cnt ×
    n_segments over the segmented vocabulary — one vocab-sized job,
    no per-doc work needed for a corpus-level drift number."""
    from mriya_spark.ops.text import bpe_segment_vocab

    vseg = bpe_segment_vocab(docs, merges, word_freq=word_freq)
    n = F.size(F.expr("regexp_extract_all(seq, '<([^>]*)>', 1)"))
    return int(
        vseg.select(F.sum(F.col("cnt") * n).alias("t")).collect()[0]["t"]
    )


def run_probe(spark, docs, n_merges: int, batches: list[int]) -> dict:
    from mriya_spark.ops.text import (
        bpe_train,
        bpe_train_approx,
        bpe_word_freq,
    )

    wf = bpe_word_freq(docs).localCheckpoint(eager=True)
    t0 = time.monotonic()
    exact = bpe_train(docs, n_merges=n_merges, max_batch=6, word_freq=wf)
    t_exact = time.monotonic() - t0
    tok_exact = total_tokens(docs, exact, wf)
    out = {
        "n_merges": n_merges,
        "exact": {
            "n_learned": len(exact),
            "sec": round(t_exact, 1),
            "total_tokens": tok_exact,
        },
        "approx": {},
    }
    for batch in batches:
        rounds: list[int] = []
        t0 = time.monotonic()
        ap = bpe_train_approx(
            docs, n_merges=n_merges, batch=batch, word_freq=wf,
            _probe=rounds,
        )
        t_ap = time.monotonic() - t0
        tok_ap = total_tokens(docs, ap, wf)
        out["approx"][str(batch)] = {
            "n_learned": len(ap),
            "rounds": len(rounds),
            "sec": round(t_ap, 1),
            "merge_set_overlap": round(merge_overlap(exact, ap), 4),
            "total_tokens": tok_ap,
            "token_drift_pct": round(100 * (tok_ap / tok_exact - 1), 3),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--batches", type=int, nargs="*", default=[64, 256, 512])
    args = ap.parse_args()
    from mriya_spark.catalog import Catalog
    from mriya_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        Catalog(spark, args.sf)
        .table("customer")
        .select(
            F.col("c_custkey").alias("doc_id"),
            F.col("c_name").alias("text"),
        )
    )
    res = run_probe(spark, docs, args.merges, args.batches)
    res["sf"] = args.sf
    print(json.dumps(res))


if __name__ == "__main__":
    main()
