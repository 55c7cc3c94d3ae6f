"""Weak-scaling probe for tokenizer_pack_chat (r16 judge directive 6).

The r16 plan deferred pack_chat's own sweep as "inherits the masked
capstone's profile" — true for the FFD stage, but its ENCODER is the
multi-turn segment-keyed pass whose k=64 turn-count behavior reads
2x flat-rate; this sweep closes the inference at corpus scale: the
sf0.01 documents corpus replicated x{1,10,100,1000} (doc_id offset by
10_000_000*k, divisible by the shard count so the per-shard length
multiset scales exactly), then the full gate pipeline: conversation
fixture -> vocabulary trained on the RENDERED replicas -> ONE
segment-keyed encode -> FFD with dual payloads -> per-window table.

Replication preserves word_freq ratios, so the trained merges are
identical across legs and token/mask totals must scale EXACTLY xmult;
window counts scale ~xmult (FFD of a repeated multiset). Walls are
cold + one warm re-run (same session), like the masked-capstone probe.

Usage: python tools/probe_pack_chat_scaling.py [--out FILE]
       [--mults 1,10,100] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(spark, sf_dir: str, mult: int, shards: int) -> dict:
    from pyspark.sql import functions as F

    from mriya_spark.caching import release_caches
    from mriya_spark.ops.text import (
        chat_encode_multiturn,
        pack_windows_bestfit,
        pack_windows_table,
    )
    from mriya_spark.queries import (
        _SFT_CAP,
        _cat,
        _multiturn_conv_frame,
        _train_vocab,
    )

    base = _cat(spark, sf_dir).table("documents").select("doc_id", "text")
    if mult > 1:
        docs = base.crossJoin(
            spark.range(mult).withColumnRenamed("id", "__rep")
        ).select(
            (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
            "text",
        )
    else:
        docs = base

    def pipeline():
        conv = _multiturn_conv_frame(docs)
        full = conv.select(
            "doc_id",
            F.expr(
                "array_join(transform(turns, t -> "
                "concat_ws(' ', t.role, ':', t.text)), ' ')"
            ).alias("text"),
        )
        wf, trained, vseg, vocab = _train_vocab(full)
        enc = chat_encode_multiturn(
            conv, trained, symbols=vocab, word_freq=wf, vseg=vseg
        )
        packed = pack_windows_bestfit(
            enc,
            context_tokens=_SFT_CAP,
            shards=shards,
            count_col="n_tokens",
            carry_cols=("token_ids", "loss_mask"),
        )
        table = pack_windows_table(packed, extra_ids_cols=("loss_mask",))
        return table.agg(
            F.count(F.lit(1)).alias("windows"),
            F.sum("fill").alias("tokens"),
            F.sum(
                F.expr(
                    "aggregate(loss_mask, cast(0 as bigint), (a, x) -> a + x)"
                )
            ).alias("mask_ones"),
            F.sum(F.size("token_ids")).alias("ids_len"),
            F.sum(F.size("loss_mask")).alias("mask_len"),
        ).collect()[0]

    walls, row = [], None
    for _ in range(2):
        release_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        row = pipeline()
        walls.append(round(time.time() - t0, 1))
    return {
        "mult": mult,
        "shards": shards,
        "windows": row["windows"],
        "tokens": int(row["tokens"]),
        "mask_ones": int(row["mask_ones"]),
        "ids_len": int(row["ids_len"]),
        "mask_len": int(row["mask_len"]),
        "wall_s_cold": walls[0],
        "wall_s_warm": walls[1],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--mults", default="1,10,100,1000")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from mriya_spark.session import get_spark

    spark = get_spark(app_name="probe_pack_chat_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for mult in (int(m) for m in args.mults.split(",")):
        shards = 64 if mult >= 1000 else 8
        rows.append(run_leg(spark, args.sf, mult, shards))
        print(json.dumps(rows[-1]))
    doc = {"note": "tokenizer_pack_chat weak scaling (r17)", "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
