#!/usr/bin/env bash
# Round-14 VERDICT directives 4+5: make the soak suites a standing
# per-round gate like the probes (tools/run_probes.sh), with a fresh
# per-round fault schedule. Runs LedgerSoakSpec + CorpusSoakSpec under
# GRAFT_SOAK=1 with GRAFT_SOAK_SEED derived from the round number
# (test-side mixing: src/test/scala/graft/SoakSeed.scala) and writes
# records/soak_r<N>.json with the seed, per-test injected-fault counts
# parsed from the suites' info() lines, and pass/fail. A re-run with
# the recorded seed reproduces the schedule bit-for-bit.
#
# usage: tools/run_soaks.sh <roundN> [seed]   (seed defaults to roundN)
set -u
cd "$(dirname "$0")/.."
ROUND=${1:?usage: run_soaks.sh <roundN> [seed]}
SEED=${2:-$ROUND}
LOG=/tmp/soak_r${ROUND}.log

echo "=== soaks: round $ROUND, GRAFT_SOAK_SEED=$SEED"
t0=$SECONDS
GRAFT_SOAK=1 GRAFT_SOAK_SEED=$SEED sbt -batch \
  "testOnly graft.operators.LedgerSoakSpec graft.streaming.CorpusSoakSpec" \
  >"$LOG" 2>&1
rc=$?
dur=$((SECONDS-t0))

# ScalaTest prints "[info] - <name>" for passes and
# "[info] - <name> *** FAILED ***" for failures — count failures by
# the marker and EXCLUDE them from the pass count (the old grep
# counted failed tests as passes and matched zero failures)
fail=$(grep -c '\*\*\* FAILED' "$LOG" || true)
pass=$(grep "^\[info\] - " "$LOG" | grep -vc '\*\*\* FAILED' || true)

python3 - "$ROUND" "$SEED" "$rc" "$pass" "$fail" "$dur" "$LOG" <<'EOF'
import json, re, sys
round_n, seed, rc, npass, nfail, dur, log = sys.argv[1:8]
tests = []
cur = None
for line in open(log, errors="replace"):
    m = re.match(r"\[info\] - (.+?)( \(.+\))?$", line.rstrip())
    if m:
        cur = {"test": m.group(1), "injected": None}
        if "*** FAILED" in line:
            cur["failed"] = True
        tests.append(cur)
    m = re.search(r"\+ (injected: .+)$", line.rstrip())
    if m and cur is not None:
        cur["injected"] = m.group(1)
out = {
    "round": int(round_n),
    "soak_seed": int(seed),
    "sbt_exit": int(rc),
    "tests_passed": int(npass),
    "tests_failed": int(nfail),
    "duration_s": int(dur),
    "reproduce": f"GRAFT_SOAK=1 GRAFT_SOAK_SEED={seed} sbt 'testOnly "
                 "graft.operators.LedgerSoakSpec graft.streaming.CorpusSoakSpec'",
    "tests": tests,
}
path = f"records/soak_r{round_n}.json"
json.dump(out, open(path, "w"), indent=1)
print(json.dumps(out, indent=1))
print(f"wrote {path}")
EOF

echo "soaks: $pass passed, $fail failed, exit=$rc, ${dur}s (log: $LOG)"
[ "$rc" -eq 0 ] && [ "$fail" -eq 0 ] && [ "$pass" -ge 7 ]
