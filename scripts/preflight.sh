#!/usr/bin/env bash
# Pre-submit gate (round-5 verdict item 7): ONE command that must be
# green before recording a round's bench/correctness artifacts.
#
#   1. full unit suite — includes tests/test_plan_audit.py (fleet-wide
#      physical-plan rules: no Python row eval, no cartesian products,
#      sanctioned-only Arrow boundaries, no unlisted global windows)
#      and tests/test_oracle_parity.py (every oracle-backed query
#      hash-diffed against its DuckDB oracle at sf0.01 — the same
#      compare the driver runs, so a red here means a red there);
#   2. scripts/correctness_local.py — the driver-faithful standalone
#      mirror (fresh session, no pre-set confs), belt-and-braces over
#      the pytest-session parity run.
#
# Usage: scripts/preflight.sh  (add pytest args after -- if needed)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python scripts/correctness_local.py
echo "preflight: ALL GREEN"
