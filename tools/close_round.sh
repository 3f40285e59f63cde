#!/usr/bin/env bash
# Round-15 VERDICT directive 6: ONE entry point for the end-of-round
# closing checklist, so no standing gate is left unrun again (the
# probe gate lapsed in round 15 purely for lack of a checklist).
#
#   tools/close_round.sh <roundN>
#
# Runs, in order:
#   1. the probe gate (engine-independent Porter/VADER/media/LSH
#      cross-checks) -> records/probes_r<N>.json
#   2. the soak gate (fresh per-round fault schedule, seed=<N>)
#      -> records/soak_r<N>.json
#   3. EVIDENCE.md regeneration from the newest per-round artifacts
# and exits non-zero if any gate fails. The bench gate is NOT here:
# it needs a probe-verified quiet box and human judgment about host
# weather (SCALING.md round-15 protocol), so it stays a deliberate
# separate step.
set -u
cd "$(dirname "$0")/.."
ROUND=${1:?usage: close_round.sh <roundN>}
fail=0

echo "=== [1/3] probe gate"
if tools/run_probes.sh; then
  cp /tmp/probe_gate/probes_summary.json "records/probes_r${ROUND}.json"
  echo "wrote records/probes_r${ROUND}.json"
else
  echo "PROBE GATE FAILED"; fail=1
fi

echo "=== [2/3] soak gate (seed $ROUND)"
if ! tools/run_soaks.sh "$ROUND"; then
  echo "SOAK GATE FAILED"; fail=1
fi

echo "=== [3/3] EVIDENCE.md"
python3 tools/gen_evidence.py "$ROUND" || fail=1

exit $fail
