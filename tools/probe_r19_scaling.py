"""Weak-scaling probes for the r19 additions: streaming shard delivery
and cell-bounded semantic dedup.

Claims under test (SCALE.md r19 rows):
1. STREAMING DELIVERY — `append_training_shards` cost per batch scales
   with the BATCH's rows, not the export's accumulated size: placement
   is scan-local (no exchange), the checksum merge is a bounded
   num_shards-row aggregate, and the write is append-only. The one
   export-sized term a caller adds is the keys-already-delivered
   anti-join, whose scan is pruned to the key column. Probe: deliver a
   fixed corpus in K batches at three volumes; report per-batch append
   cost and the final verified-read cost vs the one-shot writer's.
2. SEMANTIC DEDUP — candidate generation is cell-bounded: with
   n_centroids scaled so E[cell size] stays constant (the SemDeDup
   deployment rule: clusters scale with the corpus), total cost scales
   ~linearly in rows, NOT quadratically — the within-cell pair scan
   per cell is constant work, and the Arrow matmul assignment keeps
   the n x k dot products vectorized (the literal-fold portable path
   is for hash gates, not corpus-scaled quantizers). Probe: synthetic
   vectors at three volumes with k = n / 200 (E[cell] ~ 200, the
   worst case where NO pair qualifies so every row scans its whole
   cell); report wall time per volume.

Usage: python tools/probe_r19_scaling.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_stream_delivery(spark, results: dict) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from mriya_spark import sinks

    num_shards, n_batches = 16, 4
    for n_rows in (800_000, 3_200_000, 12_800_000):
        base = f"/tmp/probe_sdel_{n_rows}"
        shutil.rmtree(base, ignore_errors=True)
        df = spark.range(0, n_rows).selectExpr(
            "id AS doc_id",
            "concat(md5(cast(id as string)), md5(cast(id + 7 as string)))"
            " AS payload",
        )
        df.count()  # range-plan cost outside the timing

        per_batch = []
        step = n_rows // n_batches
        for b in range(n_batches):
            batch = df.filter(
                (F.col("doc_id") >= b * step)
                & (F.col("doc_id") < (b + 1) * step)
            )
            t0 = time.time()
            sinks.append_training_shards(
                batch, base, key_col="doc_id", num_shards=num_shards, seed=11
            )
            per_batch.append(round(time.time() - t0, 2))

        t0 = time.time()
        n = sinks.read_training_shards(spark, base, start=(0, 0)).count()
        t_read = time.time() - t0
        assert n == n_rows

        one = f"/tmp/probe_sdel_one_{n_rows}"
        shutil.rmtree(one, ignore_errors=True)
        t0 = time.time()
        sinks.write_training_shards(
            df, one, key_col="doc_id", num_shards=num_shards, seed=11
        )
        t_oneshot = time.time() - t0

        results[f"stream_delivery_rows_{n_rows}"] = {
            "n_batches": n_batches,
            "append_per_batch_s": per_batch,
            "append_total_s": round(sum(per_batch), 2),
            "verified_read_pos_s": round(t_read, 2),
            "oneshot_write_s": round(t_oneshot, 2),
        }
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(one, ignore_errors=True)
        print(n_rows, results[f"stream_delivery_rows_{n_rows}"], flush=True)


def probe_semantic_dedup(spark, results: dict) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from mriya_spark.ops.vector import semantic_dedup

    dim = 16
    for n_rows in (50_000, 200_000, 800_000):
        k = max(4, n_rows // 200)  # E[cell size] ~ 200, constant
        rng = random.Random(7)
        cents = []
        for _ in range(k):
            v = [rng.gauss(0, 1) for _ in range(dim)]
            nrm = math.sqrt(sum(x * x for x in v)) or 1.0
            cents.append([x / nrm for x in v])
        # deterministic pseudo-random corpus, scan-local (md5-derived
        # components; cell landing is quasi-uniform over argmax dots)
        df = spark.range(0, n_rows).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, %d), i -> "
            "conv(substr(md5(concat(cast(id as string), '_', "
            "cast(i as string))), 1, 8), 16, 10) / 4294967296.0 - 0.5)"
            " AS embedding" % (dim - 1),
        )
        df.count()
        t0 = time.time()
        kept = semantic_dedup(
            df, cents, threshold=0.999, arrow_assign=True
        ).count()
        t = time.time() - t0
        results[f"semantic_dedup_rows_{n_rows}"] = {
            "n_centroids": k,
            "kept": kept,
            "wall_s": round(t, 2),
        }
        print(n_rows, results[f"semantic_dedup_rows_{n_rows}"], flush=True)


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "benchlogs/scaling_r19_newops.json"
    )
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="probe_r19_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {}
    probe_stream_delivery(spark, results)
    probe_semantic_dedup(spark, results)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
