#!/usr/bin/env python
"""Compute the NEXT round's external 50-query window from history.

Implements the rotation recipe documented in ``queries()``'s docstring
(the hand-picked r6 window produced the round's only external red, so
the window is now derived, not curated): load every
``CORRECTNESS_r*.json``, derive each oracle-backed query's last
external green, and fill the 50 slots by priority:

1. hard cadence bound — queries whose last green would become 4+
   rounds old after the next round (the cadence moved from 3 to 4
   when the registry crossed 150 oracle-backed queries: a 50-slot
   window bounds a c-round cadence at 50·c queries, so 3 rounds
   capped out at 150 — 4 gives headroom to 200);
2. never-externally-green oracle-backed debuts;
3. stale greens — last green exactly three rounds back (they become
   the hard bound next round);
4. freshest greens — green in the immediately preceding round (ties
   broken by current registry order, which the driver uses as the
   window order anyway).

Why debuts preempt gap-2 greens (r8 ordering fix): with ~150 queries
the two most-recent 50-green cohorts alone fill every window (5
displaced hard-bounds + 50 gap-2 greens > 50 slots, every round), so
a debut ranked below gap-2 greens never enters — the starvation
ADVICE r7 flagged, just via tier 1 instead of tier 3. Ranking debuts
ABOVE gap-2 greens is safe: a displaced gap-2 green becomes next
round's hard bound and gets a guaranteed slot, so no ever-green
query's gap ever exceeds 4 (the documented cadence) as long as the
hard bound itself fits — which the overdue WARNING below checks.
``tests/test_oracle_parity.py::test_next_window_simulation`` proves
both properties by simulating the rotation to steady state.

Usage: ``python scripts/next_window.py [next_round_number]`` — prints
the 50 names in priority order plus the displaced set; paste the list
into ``queries()``'s window section (keeping the tail grouping
comments honest). The round number defaults to max(recorded)+1.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry  # noqa: E402

WINDOW = 50


def rank(backed, hist, next_round):
    """Priority order for the next round's window (pure — also driven
    by the rotation-simulation test). ``backed`` is the oracle-backed
    query list in registry order; ``hist`` maps query → last external
    green round."""
    order = {q: i for i, q in enumerate(backed)}

    def prio(q):
        # tiers follow the documented recipe: debuts preempt gap-2
        # greens (see module docstring — below them, the two 50-green
        # cohorts fill every window at ~150 queries and debuts starve
        # forever; a displaced gap-2 green is next round's guaranteed
        # hard bound, so the <=4-round cadence survives the preemption)
        last = hist.get(q)
        if last is None:
            tier = 1  # never-green debuts
        elif next_round - last >= 4:
            tier = 0  # hard cadence bound
        elif next_round - last == 3:
            tier = 2  # stale greens (become the bound next round)
        else:
            tier = 3  # fresh greens (gap 1 or 2 — safe to rest)
        return (tier, last if last is not None else -1, order[q])

    return sorted(backed, key=prio)


def main() -> None:
    hist = {}
    rounds = []
    for p in sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", p)
        r = int(m.group(1))
        rounds.append(r)
        for k, v in json.load(open(p)).items():
            if v.get("hash_match"):
                hist[k] = max(hist.get(k, 0), r)
    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else max(rounds) + 1

    queries = list(entry.queries())
    oracles = set(entry.oracle_sql())
    backed = [q for q in queries if q in oracles]

    ranked = rank(backed, hist, next_round)
    window, tail = ranked[:WINDOW], ranked[WINDOW:]
    print(f"# next window (round {next_round}), priority order:")
    for q in window:
        last = hist.get(q)
        print(f"  {q}  (last green: {'never' if last is None else f'r{last}'})")
    overdue = [q for q in tail if hist.get(q) and next_round - hist[q] >= 4]
    if overdue:
        print(f"# WARNING: {len(overdue)} overdue queries do not fit: {overdue}")
    print(f"# displaced to tail: {len(tail)} queries")


if __name__ == "__main__":
    main()
