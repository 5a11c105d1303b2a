#!/bin/bash
# sf100 heavy-tail bench runner (r13 verdict #4): the 10 sf30-heaviest
# gates, isolated (one sbt/Bench invocation per gate per rep, cold JVM),
# 2 reps in BREADTH-FIRST order — every gate gets rep 1 before any gate
# gets rep 2, so a deadline cut costs depth, not coverage. Per-gate
# timeout + a global deadline; the per-rep `[bench] q rep=N t=..s gc=..ms`
# stderr lines survive a timeout kill, so partial runs still yield
# samples via tools/extract_bench.py.
#
# Usage: run_tail_bench.sh <sfdir> <logdir> <per_gate_timeout_s> <global_deadline_s>
set -u
SFDIR=${1:?}; LOGDIR=${2:?}; GATE_TO=${3:-2700}; DEADLINE=${4:-9900}
mkdir -p "$LOGDIR"
START=$(date +%s)
GATES="q_arima_css q_doc_pagerank q_stream_sink q_stream_late \
q_ngram_jaccard_banded q_maxsim q_ngram_jaccard q_word2vec \
q_ngram_containment q_cross_val"
for rep in 1 2; do
  for q in $GATES; do
    now=$(date +%s); elapsed=$((now - START))
    if [ $elapsed -gt $DEADLINE ]; then
      echo "DEADLINE hit at ${elapsed}s before $q rep$rep"; exit 0
    fi
    log="$LOGDIR/${q}_rep${rep}.log"
    echo "=== $q rep$rep (elapsed ${elapsed}s) ==="
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY="$q" \
      timeout "$GATE_TO" sbt -batch 'runMain graft.Bench' > "$log" 2>&1
    rc=$?
    echo "=== $q rep$rep rc=$rc ==="
  done
done
echo "TAIL_BENCH_COMPLETE"
