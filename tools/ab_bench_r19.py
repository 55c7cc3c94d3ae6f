"""Same-host interleaved A/B bench: r18 tip vs r19 tip (r18 judge
directive 6 — the bench_d5_r18_samehost protocol as the standing
record).

Method: alternate full bench.py sessions over the COMMON query subset
in tip,cur,cur,tip order (two legs per tree, adjacent cur/cur and
tip/tip legs bracket host drift), one session at a time on an otherwise
idle host; per query take the min of each tree's two legs and report
cur/tip ratios. The r19-only queries ride in the cur sessions for
timing but get no ratio (no tip counterpart).

COMMON samples every code-touched headline family of the round: the
BPE trainer cadence + job-storm + fixture-persist work (changes 4-6:
tokenizer_vocab_topk, tokenizer_pack_masked, tokenizer_pack_chat,
stream_encode_fixed_vocab), the delivery sinks (format-4 checksums,
stats-agg clamp, append-recompute fix: sink_packed_shards,
sink_packed_shards_attention, sink_shards_resume, shard_shuffle,
sample_epoch_plan), the fuzzy-join hot-list persist
(join_fuzzy_multiblock), and the IVF broadcast cache
(similarity_ann_ivf). agg_groupby and pipeline_corpus_curation_lsh
are the code-untouched in-session controls (the tokenizer family
cannot control — the trainer commits touch all of it). Warm runs per
leg are clamped to 3 via SPARK_GRAFT_BENCH_WARM_RUNS to keep the
4-leg protocol affordable; min-of-legs is the statistic either way.

Usage: python tools/ab_bench_r19.py <tip_worktree> <out_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

COMMON = [
    "agg_groupby",                    # control (untouched)
    "pipeline_corpus_curation_lsh",   # control (examined, untouched)
    "dedup_substring",                # control (untouched; flagged 3.3x
                                      # in the drifted closing session)
    "tokenizer_dpo_pairs",            # fixture persists (6)
    "tokenizer_chunk_masked",         # cadence + masks fixtures (4-6)
    "tokenizer_vocab_topk",           # trainer cadence (change 4)
    "tokenizer_pack_masked",          # cadence + fixture persists (4-6)
    "tokenizer_pack_chat",            # fixture persists (6)
    "stream_encode_fixed_vocab",      # cadence + schema guard (5, 7)
    "join_fuzzy_multiblock",          # hot-list persist (7)
    "shard_shuffle",
    "sample_epoch_plan",
    "similarity_ann_ivf",             # centroid broadcast cache (2)
    "sink_packed_shards",             # append recompute + stats clamp (5, 7)
    "sink_packed_shards_attention",
    "sink_shards_resume",
]
R19_ONLY = [
    "sink_epoch_resume",
    "dedup_semantic_ivf",
    "stream_shard_delivery",
]


def run_leg(tree: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(names)
    env.setdefault("SPARK_GRAFT_BENCH_WARM_RUNS", "3")
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed in {tree} (rc={out.returncode}); "
            f"stderr tail: {out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])["queries"]


def main() -> None:
    tip_tree, out_path = sys.argv[1], sys.argv[2]
    cur_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    legs = []
    for label, tree, names in (
        ("tip", tip_tree, COMMON),
        ("cur", cur_tree, COMMON + R19_ONLY),
        ("cur", cur_tree, COMMON + R19_ONLY),
        ("tip", tip_tree, COMMON),
    ):
        print(f"leg {label} ...", flush=True)
        legs.append((label, run_leg(tree, names)))

    tip_legs = [q for l, q in legs if l == "tip"]
    cur_legs = [q for l, q in legs if l == "cur"]
    rows = {}
    for n in COMMON:
        t = min(x[n] for x in tip_legs)
        c = min(x[n] for x in cur_legs)
        rows[n] = {
            "tip_min": t,
            "cur_min": c,
            "ratio": round(c / t, 2),
            "tip_legs": [x[n] for x in tip_legs],
            "cur_legs": [x[n] for x in cur_legs],
        }
    for n in R19_ONLY:
        rows[n] = {
            "cur_min": min(x[n] for x in cur_legs),
            "cur_legs": [x[n] for x in cur_legs],
            "note": "r19-only, no tip counterpart",
        }
    payload = {
        "what": (
            "r19 directive-6 same-host A/B: 13 code-touched headline "
            "rows + 3 untouched controls, r18 tip vs r19 tip "
            "interleaved (order tip,cur,cur,tip; 1 cold + 3 warm runs "
            "per leg via bench.py, min of two legs per tree); 3 "
            "r19-only rows timed in the cur legs"
        ),
        "rows": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({n: rows[n].get("ratio") for n in COMMON}, indent=0))


if __name__ == "__main__":
    main()
