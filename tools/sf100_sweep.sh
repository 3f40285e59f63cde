#!/usr/bin/env bash
# Round-14 directive 1: extend sf100 correctness from 4 queries to the
# scale-sensitive set. Runs the engine side (VerifySubset) in table-
# affine batches against the derived sf100 corpus, then the DuckDB
# oracle compare per batch; one combined summary on stdout.
#
# usage: tools/sf100_sweep.sh [sfDir] [outRoot] [batch1,batch2,...]
# The optional batch filter runs only the named batches (incremental
# rounds re-run what changed; the combined summary then covers only
# this run's logs — record concatenation is the caller's job).
set -u
cd "$(dirname "$0")/.."
SF=${1:-/tmp/sf100_derived}
OUT=${2:-/tmp/v100}
ONLY=${3:-}
mkdir -p "$OUT"
# stale logs from prior runs (e.g. a batch whose engine step failed this
# run) would pollute the combined summary and inflate the OK count
rm -f "$OUT"/*.oracle.log "$OUT"/*.engine.log
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g}

fail=0
run_batch() { # name queries...
  local name=$1; shift
  if [ -n "$ONLY" ] && ! echo ",$ONLY," | grep -q ",$name,"; then
    echo "=== skipping [$name] (batch filter)"; return
  fi
  echo "=== engine [$name]: $*"
  local t0=$SECONDS
  if ! sbt -batch "runMain graft.tools.VerifySubset $SF $OUT/$name $*" \
      >"$OUT/$name.engine.log" 2>&1; then
    echo "ENGINE FAIL [$name]; last 30 lines:"; tail -30 "$OUT/$name.engine.log"
    fail=1; return
  fi
  echo "    engine [$name] done in $((SECONDS-t0))s"
  t0=$SECONDS
  if ! python3 tools/check_oracle.py "$SF" "$OUT/$name" \
      >"$OUT/$name.oracle.log" 2>&1; then
    echo "ORACLE FAIL [$name]:"; cat "$OUT/$name.oracle.log"
    fail=1
  else
    cat "$OUT/$name.oracle.log"
  fi
  echo "    oracle [$name] done in $((SECONDS-t0))s"
}

# joins across the broadcast threshold (orders 150M x lineitem 600M;
# q05's 147M-row result goes through check_oracle's digest path)
run_batch joins q04_anti_join q05_semi_join
# skew-mitigation forms over 100M events
run_batch events q121_salted_join q35_salted_agg
# documents: scan-local + sampling/boundary family (5M docs)
run_batch docs_light q25_exact_dedup q184_corpus_shuffle x05_langid \
  q185_token_budget q186_token_budget_by_source x31_range_sharded \
  x30_perplexity_buckets_approx x25_length_curriculum_approx
# embeddings: LSH top-k over 2M vectors
run_batch ann x13_cosine_topk_lsh
# documents: banded dedup + incremental ledgers (heaviest oracles last)
run_batch dedup x09_minhash_dedup x28_incremental_dedup q93_delta_funnel
# round-15 breadth (round-14 VERDICT directive 6): the index family,
# bloom skipping, prefix-jaccard postings form, 3-gram decontamination,
# and the simhash pair replay (the heaviest DuckDB leg at sf10)
run_batch index q115_postings_build q116_index_topk q117_index_incremental \
  q131_bloom_skipping
run_batch decontam q54_decontaminate q135_prefix_jaccard
run_batch simhash x10_simhash_dedup

echo "=== combined summary"
# anchored per-query patterns: unanchored 'rows-only' also matched each
# log's trailing 'N oracle-checked, M rows-only, K failures' line
grep -h "^  OK \|^FAIL \|^  \[rows-only\]" "$OUT"/*.oracle.log | sort
# (awk, not bc — bc is not installed in this container)
tot=$(grep -h "^  OK" "$OUT"/*.oracle.log 2>/dev/null | wc -l)
echo "total OK: ${tot:-0}; overall: $([ $fail -eq 0 ] && echo PASS || echo FAIL)"
exit $fail
