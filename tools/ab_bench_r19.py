"""Same-host interleaved A/B bench: r18 tip vs r19 tip (r18 judge
directive 6 — the bench_d5_r18_samehost protocol as the standing
record).

Method: alternate full bench.py sessions over the COMMON query subset
in tip,cur,cur,tip order (two legs per tree, adjacent cur/cur and
tip/tip legs bracket host drift), one session at a time on an otherwise
idle host; per query take the min of each tree's two legs and report
cur/tip ratios. The r19-only queries ride in the cur sessions for
timing but get no ratio (no tip counterpart).

COMMON covers every headline row whose code was touched this round:
the delivery sinks (format-4 checksums changed `_shard_row_stats` for
all writes/verifies), the `shard_shuffle` -> `shard_assign` + window
refactor (sample_epoch_plan, shard_shuffle), and the IVF broadcast
cache (similarity_ann_ivf); agg_groupby + tokenizer_pack_bestfit are
the code-untouched in-session controls.

Usage: python tools/ab_bench_r19.py <tip_worktree> <out_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

COMMON = [
    "agg_groupby",            # control (untouched)
    "tokenizer_pack_bestfit",  # control (untouched)
    "shard_shuffle",
    "sample_epoch_plan",
    "similarity_ann_ivf",
    "sink_packed_shards",
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
            "r19 directive-6 same-host A/B: 6 code-touched headline "
            "rows + 2 untouched controls, r18 tip vs r19 tip "
            "interleaved (order tip,cur,cur,tip; 1 cold + warm runs "
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
