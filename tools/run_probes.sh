#!/usr/bin/env bash
# Per-round probe gate (round-13 VERDICT directive 5): the four
# independent cross-executors — Porter stems, media decoders, the
# adversarial sentiment corpus, and the x14 near-dup LSH statistics —
# ran as one-time events in rounds 12-13; this script makes them a
# standing gate. It executes every engine dump + Python probe against
# the gate corpus, writes a per-probe summary JSON, and exits non-zero
# if ANY probe reports a mismatch.
#
# usage: tools/run_probes.sh [sfDir] [workDir] [summaryJson]
# defaults: /root/testdata/sf0.01  /tmp/probe_gate  workDir/probes_summary.json
#
# The closing checklist runs this next to Verify:
#   tools/run_probes.sh && cp /tmp/probe_gate/probes_summary.json records/probes_rN.json
set -u
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
WORK=${2:-/tmp/probe_gate}
SUMMARY=${3:-$WORK/probes_summary.json}
mkdir -p "$WORK"

declare -A RESULT
overall=0

run_step() { # name, command...
  local name=$1; shift
  echo "=== [$name] $*"
  if "$@" >"$WORK/$name.log" 2>&1; then
    RESULT[$name]=pass
  else
    RESULT[$name]=fail
    overall=1
    echo "--- [$name] FAILED; last 30 log lines:"
    tail -30 "$WORK/$name.log"
  fi
}

# ---- 1. Porter stems: engine dump vs from-the-paper Python ----------
# Battery = the adversarial word list (paper examples + the m-condition
# fall-through class the round-13 bug lived in) + a systematic
# roots x step-suffixes x stacked-suffixes sweep, regenerated
# deterministically here so the gate never depends on an uncommitted
# /tmp file (the round-13 battery was ad hoc; this one is standing).
python3 - "$WORK/battery.txt" <<'EOF'
import sys
words = set("""
caresses ponies ties caress cats feed agreed plastered bled motoring
sing conflated troubled sized hopping tanned falling hissing fizzed
failing filing happy sky relational conditional rational valenci
hesitanci digitizer conformabli radicalli differentli vileli
analogousli vietnamization predication operator feudalism
decisiveness hopefulness callousness formaliti sensitiviti sensibiliti
triplicate formative formalize electriciti electrical hopeful goodness
revival allowance inference airliner gyroscopical adjustable defensible
irritant replacement adjustment dependent adoption homologou communism
activate angulariti homologous effective bowdlerize probate rate cease
basement agreement document movement compliment supplement experiment
department apartment argument monument instrument settlement statement
treatment commitment environment management deferment abatement
element moment segment comment cement ferment torment augment
controll roll generalization generalize oscillation oscillate
""".split())
roots = """agre bas docu te mov compli se mo argu ele ce com fer tor
aug activ rat oper predic relat condit rational valen hesit digit
conform radic differ vile analog feudal decis hope callous form sensit
sensib triplic electric good reviv allow infer airlin gyroscop adjust
defens irrit replac depend adopt homolog commun angular effect bowdler
prob controll roll generaliz oscill connect flap fil fit success steel
plaster troubl siz hop tan fall hiss fizz fail happi rapid press
""".split()
suffixes = """sses ies ss s eed ed ing at bl iz y ational tional enci
anci izer abli alli entli eli ousli ization ation ator alism iveness
fulness ousness aliti iviti biliti icate ative alize iciti ical ful
ness al ance ence er ic able ible ant ement ment ent ion ou ism ate
iti ous ive ize e ll
""".split()
stacked = ["ement", "ements", "ation", "ations", "ization",
           "izations", "fulness", "ousness", "iveness", "alli",
           "ationalli", "ivenesses"]
for r in roots:
    for s in suffixes:
        words.add(r + s)
    for s in stacked:
        words.add(r + s)
with open(sys.argv[1], "w") as f:
    f.write("\n".join(sorted(words)) + "\n")
print(f"battery: {len(words)} terms")
EOF

run_step stemdump sbt -batch "runMain graft.tools.StemDump $SF $WORK/stems.tsv $WORK/battery.txt"
run_step porter python3 tools/porter_probe.py "$WORK/stems.tsv"

# ---- 2. Media decoders: engine dump vs stdlib struct/zlib -----------
run_step mediadump sbt -batch "runMain graft.tools.MediaDump $SF $WORK/media"
run_step media python3 tools/media_probe.py "$WORK/media" "$SF"

# ---- 3. Adversarial sentiment corpus through the oracle compare -----
run_step trickygen python3 tools/sentiment_oracle_probe.py
run_step trickyverify sbt -batch "runMain graft.tools.VerifySubset /tmp/tricky /tmp/vtricky x01_vader_scores x02_sentiment_histogram x03_analyze_tokens x04_analyzed_search"
run_step sentiment python3 tools/check_oracle.py /tmp/tricky /tmp/vtricky

# ---- 4. x14 near-dup pairs vs brute-force cosine ground truth -------
run_step neardupdump sbt -batch "runMain graft.tools.NearDupDump $SF $WORK/neardup"
run_step neardup python3 tools/neardup_probe.py "$WORK/neardup" "$SF"

# ---- summary ---------------------------------------------------------
{
  echo "{"
  echo "  \"sf\": \"$SF\","
  echo "  \"probes\": {"
  first=1
  for k in stemdump porter mediadump media trickygen trickyverify sentiment neardupdump neardup; do
    [ $first -eq 0 ] && echo ","
    first=0
    printf '    "%s": "%s"' "$k" "${RESULT[$k]:-skipped}"
  done
  echo ""
  echo "  },"
  echo "  \"overall\": \"$([ $overall -eq 0 ] && echo pass || echo fail)\""
  echo "}"
} >"$SUMMARY"
echo "=== probe gate summary -> $SUMMARY"
cat "$SUMMARY"
exit $overall
