"""SF-sweep scaling probe: run a representative bench subset at
sf0.001/0.01/0.1 and print per-decade time ratios.

Two readings (see SCALE.md "r12 SF-sweep scaling probe"):

1. documents/embeddings are IDENTICAL at sf0.001 and sf0.01, so that
   column is a same-data repeat-run experiment — the measured
   session-to-session noise band (r12, two sweeps: 0.72-1.16 at
   seconds-scale, up to ~1.4 below 0.3s where absolute jitter
   dominates).
2. Over a true 10x decade, a time ratio near 100x exposes an
   accidentally quadratic operator (unblocked all-pairs join, missing
   band gate). r12 worst case across two sweeps: 2.72-3.83x
   (text_classifier_score, the most data-bound family); everything
   else 0.7-2.1x. Point slopes carry ~+-30% between sweeps — cite
   ranges from at least two runs, never a single sweep.

Each SF runs in a FRESH JVM via `bench.py` (subprocess) with
SPARK_GRAFT_BENCH_QUERIES so the full-run sidecar is not clobbered.
Rerun when adding a new join-heavy family; commit the payload as
BENCH_SCALING_r{N}.json.

Usage: python tools/bench_scaling.py [--out FILE] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: One per expensive family; keep in sync with bench.py's HEADLINE.
DEFAULT_QUERIES = [
    "agg_groupby",
    "join_inner_multi",
    "dedup_exact",
    "dedup_minhash_lsh",
    "pipeline_corpus_curation_lsh",
    "similarity_ann_ivf",
    "text_classifier_score",
    "graph_pagerank",
    "tokenizer_bpe_pack",
    "search_bm25_indexed",
]

SFS = ("0.001", "0.01", "0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the 3-SF payload here")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    payload = {}
    for sf in SFS:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
            SPARK_GRAFT_BENCH_QUERIES=args.queries,
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        payload[f"sf{sf}"] = json.loads(line)
        print(f"sf{sf}: total {payload[f'sf{sf}']['value']}s", file=sys.stderr)

    q = {sf: payload[f"sf{sf}"]["queries"] for sf in SFS}
    print(
        f"{'query':34s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s}"
        f" {'r(mid/low)':>10s} {'r(top/mid)':>10s}"
    )
    for n in args.queries.split(","):
        a, b, c = (q[sf].get(n) for sf in SFS)
        if None in (a, b, c):
            print(f"{n:34s} MISSING")
            continue
        print(
            f"{n:34s} {a:8.3f} {b:8.3f} {c:8.3f} {b / a:10.2f} {c / b:10.2f}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"payload -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
