"""Weak-scaling probe for the manifest-verified shard delivery path
(r18): write_training_shards -> full verified read -> resumed read.

Claims under test (SCALE.md "delivery" rows):
1. Write cost scales ~linearly in rows (one hash exchange + partitioned
   write + the bounded num_shards-row checksum aggregate).
2. The format-3 row-content checksum adds only a map-side-combinable
   aggregate on top of the format-agnostic read — verify cost tracks
   the VERIFIED volume.
3. A resumed read from the 3/4 boundary costs ~the tail fraction of the
   full verified read (partition pruning is real, not just in the plan
   text): both its scan AND its verify aggregate touch only the tail.

Usage: python tools/probe_shard_delivery_scaling.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "benchlogs/scaling_r18_delivery.json"
    from pyspark.sql import functions as F  # noqa: F401

    from mriya_spark import sinks
    from mriya_spark.session import get_spark

    spark = get_spark(app_name="probe_shard_delivery")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    num_shards = 16
    for n_rows in (1_600_000, 6_400_000, 25_600_000):
        base = f"/tmp/probe_delivery_{n_rows}"
        shutil.rmtree(base, ignore_errors=True)
        # incompressible ~96-byte payload (md5 hex defeats parquet
        # dictionary/RLE encoding, so the verified read actually pays
        # per-byte scan cost — a repeated-token blob compresses to
        # nothing and the probe would time only job overhead)
        df = spark.range(0, n_rows).selectExpr(
            "id AS doc_id",
            "concat(md5(cast(id as string)), md5(cast(id + 7 as string)), "
            "md5(cast(id + 13 as string))) AS payload",
        )
        df.count()  # materialize the range plan cost outside the timing

        t0 = time.time()
        sinks.write_training_shards(
            df, base, key_col="doc_id", num_shards=num_shards, seed=11
        )
        t_write = time.time() - t0

        def timed_read(start=None):
            best = None
            for _ in range(2):  # min-of-2: absorb one scheduling hiccup
                t0 = time.time()
                out = sinks.read_training_shards(spark, base, start=start)
                n = out.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best, n

        t_full, n_full = timed_read()
        s0 = num_shards * 3 // 4
        t_res, n_res = timed_read(start=(s0, 0))

        results[str(n_rows)] = {
            "write_s": round(t_write, 2),
            "full_verified_read_s": round(t_full, 2),
            "resumed_read_s": round(t_res, 2),
            "rows_full": n_full,
            "rows_resumed": n_res,
            "tail_fraction": round(n_res / n_full, 3),
            "resume_cost_fraction": round(t_res / t_full, 3),
        }
        print(n_rows, results[str(n_rows)], flush=True)
        shutil.rmtree(base, ignore_errors=True)

    payload = {
        "what": (
            "weak-scaling of the manifest-verified shard delivery: write "
            "(reshard + partitioned write + format-3 checksum agg), full "
            "verified read, and resumed read from the 3/4 shard boundary "
            f"({num_shards} shards, incompressible ~96B payload, "
            "min-of-2 reads). Expectation: resume_cost_fraction trends "
            "toward tail_fraction (0.25) as volume grows past per-job "
            "fixed overhead; at small volumes fixed overhead dominates "
            "both reads and the fraction sits near 1.0 — the pruning "
            "itself is structural (plan-asserted in "
            "test_resume_read_prunes_shard_partitions)"
        ),
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
