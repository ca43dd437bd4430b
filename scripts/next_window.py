#!/usr/bin/env python
"""Compute the NEXT round's external 50-query window from history.

Implements the rotation recipe documented in ``queries()``'s docstring
(the hand-picked r6 window produced the round's only external red, so
the window is now derived, not curated): load every
``CORRECTNESS_r*.json``, derive each oracle-backed query's last
external green, and fill the 50 slots by priority:

1. hard cadence bound — queries whose last green would become 3+
   rounds old after the next round;
2. stale greens — last green exactly two rounds back (they become
   the hard bound next round);
3. never-externally-green oracle-backed debuts;
4. freshest greens — green in the immediately preceding round (ties
   broken by current registry order, which the driver uses as the
   window order anyway).

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
    order = {q: i for i, q in enumerate(queries)}
    backed = [q for q in queries if q in oracles]

    def prio(q):
        # tiers follow the documented recipe: debuts sit BETWEEN stale
        # greens and last-round's fresh greens — ranking them below ALL
        # ever-greens would starve them forever (they never trip the
        # tier-0 cadence bound, since `last` stays None), ADVICE r7.
        last = hist.get(q)
        if last is None:
            tier = 2  # never-green debuts
        elif next_round - last >= 3:
            tier = 0  # hard cadence bound
        elif next_round - last == 2:
            tier = 1  # stale greens (become the bound next round)
        else:
            tier = 3  # fresh greens (green just last round)
        return (tier, last if last is not None else -1, order[q])

    ranked = sorted(backed, key=prio)
    window, tail = ranked[:WINDOW], ranked[WINDOW:]
    print(f"# next window (round {next_round}), priority order:")
    for q in window:
        last = hist.get(q)
        print(f"  {q}  (last green: {'never' if last is None else f'r{last}'})")
    overdue = [q for q in tail if hist.get(q) and next_round - hist[q] >= 3]
    if overdue:
        print(f"# WARNING: {len(overdue)} overdue queries do not fit: {overdue}")
    print(f"# displaced to tail: {len(tail)} queries")


if __name__ == "__main__":
    main()
