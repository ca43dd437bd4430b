#!/usr/bin/env python
"""Compute the NEXT round's external 50-query window from history.

Implements the rotation recipe documented in ``queries()``'s docstring
(the hand-picked r6 window produced the round's only external red, so
the window is now derived, not curated): load every
``CORRECTNESS_r*.json``, derive each oracle-backed query's external
green history, and fill the 50 slots by priority:

1. hard cadence bound — queries whose last green would exceed their
   re-green cadence after the next round. The cadence is PER-QUERY
   (r9 re-tiering): a query externally green in >= 2 distinct rounds
   is a *stable veteran* and re-greens every 6 rounds; anything
   younger re-greens every 5 (r11 re-tune — see the CADENCE_YOUNG
   comment). Rationale: at 162+ registry queries a uniform 4-round
   cadence consumes ~40 of the 50 slots per round in maintenance, so
   a 50-strong green cohort (an entire past window) comes due
   *simultaneously* and starves debuts — the exact failure
   ``test_next_window_simulation`` caught after r8 landed. Stable
   veterans carry independent external proofs already; stretching
   them to 6 rounds frees ~13 slots/round and moves whole-cohort due
   dates past any debut backlog.
2. never-externally-green oracle-backed debuts;
3. stale greens — queries that become the hard bound next round
   (gap == cadence-1);
4. fresher greens, OLDEST last-green first — spare slots drain
   upcoming cohorts early, so no 50-strong cohort ever comes due at
   once (the self-spreading property the simulation proves).

Why debuts preempt gap-2/3 greens (r8 ordering fix): with ~150
queries the two most-recent 50-green cohorts alone fill every window,
so a debut ranked below them never enters — the starvation ADVICE r7
flagged. Ranking debuts ABOVE non-overdue greens is safe: a displaced
stale green becomes next round's hard bound and gets a guaranteed
slot, so no ever-green query's gap ever exceeds its cadence as long
as the hard bound itself fits — which the overdue WARNING below and
``tests/test_oracle_parity.py::test_next_window_simulation`` both
check (the test simulates the rotation 12 rounds ahead).

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

WINDOW = 50
# stable veterans (>= VETERAN_GREENS distinct external greens) re-green
# every 6 rounds; younger queries every 5. A 50-slot window bounds a
# c-round cadence at 50*c queries: all-veteran steady state supports
# 300 registry queries with ~23 spare slots/round for debuts.
#
# VETERAN_GREENS dropped 3 -> 2 in r10: the r10 window greens ~45
# young queries at once (the 44-debut backlog), and under
# promotion-at-3 that entire cohort stays cadence-4 through its SECOND
# green too — so it comes due simultaneously twice, and the second
# resonance (r14) overflows the 50-slot window by one at 201 registry
# queries (test_next_window_simulation caught it). Two independent
# external proofs are sufficient confidence to stretch to cadence 6;
# the 24-round simulation is clean under promotion-at-2.
VETERAN_GREENS = 2
CADENCE_VETERAN = 6
# CADENCE_YOUNG raised 4 -> 5 in r11 (the red-absorption re-tune):
# the r8/r9/r10 windows each greened a ~45-wide one-green cohort, so
# at young cadence 4 their re-green waves saturate rounds 12-14
# back-to-back-to-back with ZERO slack — the all-green steady state
# drains to exactly 48/50 at r14, and even r10's real two-red round
# overflows the window four rounds later (the transiently-red scenario
# in test_next_window_simulation). Cadence 5 de-phases the waves by a
# round (due r13/r14/r15), restoring a full spare round of pre-drain;
# the 25-round simulation then absorbs FIVE reds per round. (A
# deterministic per-query cadence jitter was tried first and REJECTED:
# it pulls half of every wave one round EARLIER, tripling the r13
# collision.)
CADENCE_YOUNG = 5


def cadence(greens) -> int:
    """Per-query re-green cadence from its external green history
    (an iterable of distinct green round numbers)."""
    return CADENCE_VETERAN if len(greens) >= VETERAN_GREENS else CADENCE_YOUNG


def rank(backed, hist, next_round):
    """Priority order for the next round's window (pure — also driven
    by the rotation-simulation test). ``backed`` is the oracle-backed
    query list in registry order; ``hist`` maps query → set/list of
    distinct external-green round numbers (empty/absent = debut)."""
    order = {q: i for i, q in enumerate(backed)}

    def prio(q):
        greens = hist.get(q) or ()
        if not greens:
            # never-green debuts — above everything except the hard
            # bound (see module docstring: below the green cohorts
            # they starve forever at 150+ queries)
            return (1, -1, order[q])
        last = max(greens)
        c = cadence(greens)
        gap = next_round - last
        if gap >= c:
            tier = 0  # hard cadence bound
        elif gap == c - 1:
            tier = 2  # stale — becomes the bound next round
        else:
            tier = 3  # fresh — oldest-first drains cohorts early
        return (tier, last, order[q])

    return sorted(backed, key=prio)


def load_history(root):
    """query → set of distinct external-green rounds, plus the max
    recorded round number."""
    hist = {}
    rounds = [0]
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", p)
        r = int(m.group(1))
        rounds.append(r)
        for k, v in json.load(open(p)).items():
            if v.get("hash_match"):
                hist.setdefault(k, set()).add(r)
    return hist, max(rounds)


def main() -> None:
    import __spark_entry__ as entry  # noqa: E402 (spark-free import)

    root = os.path.join(os.path.dirname(__file__), "..")
    hist, last_round = load_history(root)
    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else last_round + 1

    queries = list(entry.queries())
    oracles = set(entry.oracle_sql())
    backed = [q for q in queries if q in oracles]

    ranked = rank(backed, hist, next_round)
    window, tail = ranked[:WINDOW], ranked[WINDOW:]
    print(f"# next window (round {next_round}), priority order:")
    for q in window:
        greens = hist.get(q)
        if greens:
            note = f"last green: r{max(greens)}, cadence {cadence(greens)}"
        else:
            note = "last green: never"
        print(f"  {q}  ({note})")
    overdue = [
        q for q in tail
        if hist.get(q) and next_round - max(hist[q]) >= cadence(hist[q])
    ]
    if overdue:
        print(f"# WARNING: {len(overdue)} overdue queries do not fit: {overdue}")
    print(f"# displaced to tail: {len(tail)} queries")


if __name__ == "__main__":
    main()
