"""Maintain GATE_DIGESTS.json — the changed-query gate re-priority
sidecar (r10 judge directive 2).

Problem: the driver's per-round correctness gate is capped, and
``__spark_entry__`` orders queries staleness-first — so a query whose
newest official row is GREEN coasts for rounds even if its code or
oracle has since materially changed (``quality_outlier_iqr`` in r10:
fixed from a 0-row trivial query to a 471-row one, but its green
official row described the retired query). The existing
rows-only→oracled upgrade rule generalizes: persist a digest of each
query's oracle SQL, and treat a digest that changed AFTER the query's
newest official row as "never recorded" so the gate re-records it in
its change round.

Sidecar format: ``{name: {"digest": md5(oracle_sql + fn co_code +
co_consts recursed), "since": N}}`` (the digest formula lives in
``__spark_entry__._query_digest`` — oracle semantics + query-function
bytecode + constants, own-docstring-insensitive; shared-op edits are
out of scope and covered by tests/sweeps instead)
where ``since`` is the round whose gate first ran with this digest
(current round = max recorded CORRECTNESS round + 1 at update time).
Rows-only queries are digested too (bytecode only): a materially
changed rows-only query re-records promptly even though the
unchanged ones rotate last.

Run this EVERY round as part of the hygiene loop (after any oracle
edit, before the driver's gate). Forgetting is safe but wasteful:
``__spark_entry__`` also treats a live-computed digest that mismatches
the sidecar as changed, so an un-refreshed edit still re-records — it
just keeps burning a slot every round until the sidecar catches up.

Usage: python tools/update_gate_digests.py [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(ROOT, "GATE_DIGESTS.json")




def current_round() -> int:
    rounds = [0]
    for name in os.listdir(ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--migrate",
        action="store_true",
        help=(
            "digest-ALGORITHM change mode: recompute every digest with "
            "the current _query_digest but PRESERVE each entry's "
            "existing 'since' round. Run at the code tip the old "
            "digests described, BEFORE real edits — otherwise an "
            "algorithm change (e.g. the r12 co_consts extension) would "
            "stamp the whole registry 'changed' and dump 199 tier-0 "
            "entries into one round's capped gate."
        ),
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mriya_spark import queries as registry

    oracles = registry.oracle_sql()
    fns = registry.queries()
    bootstrap = not os.path.exists(SIDECAR)
    try:
        with open(SIDECAR) as fh:
            stored = json.load(fh)
    except (OSError, ValueError):
        stored = {}

    rnd = current_round()
    # first-ever run: the sidecar can't know WHEN each existing oracle
    # took its current form, and stamping the current round would mark
    # the whole registry "changed" — so existing queries bootstrap at
    # since=0 (assume the official record describes them) and any
    # known post-record change is patched in by hand with its
    # documented round (r10: quality_outlier_iqr, commit 2be848a)
    first_since = 0 if bootstrap else rnd
    out: dict[str, dict] = {}
    changed, new, dropped = [], [], []
    for name, fn in fns.items():
        dig = entry_mod._query_digest(fn, oracles.get(name))
        prev = stored.get(name)
        if args.migrate and prev is not None:
            if prev.get("digest") != dig:
                changed.append(name)
            out[name] = {"digest": dig, "since": prev.get("since", 0)}
            continue
        if prev is None:
            # first sighting: a brand-new query is tier-0 via its
            # missing official row anyway, so "since" only matters if
            # it somehow already has a row — current round is correct
            # (except on bootstrap, see above)
            out[name] = {"digest": dig, "since": first_since}
            new.append(name)
        elif prev.get("digest") != dig:
            out[name] = {"digest": dig, "since": rnd}
            changed.append(name)
        else:
            out[name] = prev
    for name in stored:
        if name not in fns:
            dropped.append(name)

    print(
        f"round {rnd}: {len(out)} queries — "
        f"{len(new)} new, {len(changed)} changed, {len(dropped)} dropped"
    )
    for n in changed:
        print(f"  changed: {n} (since -> r{rnd})")
    for n in dropped:
        print(f"  dropped: {n}")
    if not args.dry_run:
        with open(SIDECAR, "w") as fh:
            json.dump(out, fh, indent=0, sort_keys=True)
        print(f"wrote {SIDECAR}")


if __name__ == "__main__":
    main()
