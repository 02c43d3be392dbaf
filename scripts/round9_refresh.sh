#!/bin/bash
# Round-9 artifact refresh: suite, tri-SF oracle gate, PERF, SCALING,
# STREAMBENCH, bench, plans, ITERSCALE, SERVE (three serving families,
# incl. the synthetic-sf1 point), RECALL (ANN recall regression), and
# the FULL-PACK sf1 scaling point — sequential so sbt/Spark never
# contend.
#
# Unlike the round-8 scripts, every artifact overwrite is GATED on its
# stage's exit code (and the committed-artifact stages additionally on
# the JSON actually parsing): a red run records its failure in the
# status log and leaves the previous committed artifact in place
# instead of silently refreshing it.
set -x
cd /root/repo
STATUS=/tmp/r9_status.log
rm -f $STATUS

run_json_stage () { # name, log, grep-pattern, artifact
  local name=$1 log=$2 pat=$3 art=$4
  local rc=$5
  if [ "$rc" -ne 0 ]; then
    echo "${name}_EXIT=$rc ARTIFACT_KEPT" >> $STATUS
    return 1
  fi
  local j
  j=$(grep -o "$pat" "$log" | tail -1)
  if [ -n "$j" ] && echo "$j" | python3 -c 'import json,sys; json.load(sys.stdin)' 2>/dev/null; then
    echo "$j" > "$art"
    echo "${name}_EXIT=0 WROTE=$art" >> $STATUS
  else
    echo "${name}_JSON_MISSING ARTIFACT_KEPT" >> $STATUS
    return 1
  fi
}

sbt -batch test > /tmp/r9_test.log 2>&1
TEST_EXIT=$?
echo "TEST_EXIT=$TEST_EXIT $(grep -E 'Tests: succeeded' /tmp/r9_test.log | tail -1)" >> $STATUS

GATE_FAIL=0
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r9_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r9_$sf" > /tmp/r9_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r9_$sf > /tmp/r9_oracle_$sf.log 2>&1
  G=$?
  [ $G -ne 0 ] && GATE_FAIL=1
  echo "GATE_sf$sf=$G $(tail -1 /tmp/r9_oracle_$sf.log)" >> $STATUS
done

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r9_perf.log 2>&1
run_json_stage PERF /tmp/r9_perf.log '{"sf".*}' /root/repo/PERF_r09.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r9_scale.log 2>&1
run_json_stage SCALE /tmp/r9_scale.log '{"sfs".*}' /root/repo/SCALING_r09.json $?

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench STREAMBENCH_r09.json" > /tmp/r9_stream.log 2>&1
echo "STREAM_EXIT=$?" >> $STATUS

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r9_bench.log 2>&1
echo "BENCH_EXIT=$? last_line_parses=$(tail -1 /tmp/r9_bench.log | python3 -c 'import json,sys; json.load(sys.stdin); print(1)' 2>/dev/null)" >> $STATUS

sbt -batch "runMain graft.PlanDump" > /tmp/r9_plans.log 2>&1
echo "PLANS_EXIT=$?" >> $STATUS

sbt -batch "runMain graft.IterScale ITERSCALE_r09.json" > /tmp/r9_iter.log 2>&1
echo "ITER_EXIT=$?" >> $STATUS

# serving latency: three families, incl. the synthetic-sf1 point
# (1000x span); writes its own file only on success
SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.ServeBench /tmp/SERVE_r09.json" > /tmp/r9_serve.log 2>&1
SERVE_EXIT=$?
if [ $SERVE_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/SERVE_r09.json"))' 2>/dev/null; then
  cp /tmp/SERVE_r09.json /root/repo/SERVE_r09.json
  echo "SERVE_EXIT=0 WROTE=SERVE_r09.json" >> $STATUS
else
  echo "SERVE_EXIT=$SERVE_EXIT ARTIFACT_KEPT" >> $STATUS
fi

# ANN recall regression artifact (round-9 stretch): recall@5 +
# n_scanned per serving family, incl. the synthetic-sf1 point
SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.RecallBench /tmp/RECALL_r09.json" > /tmp/r9_recall.log 2>&1
RECALL_EXIT=$?
if [ $RECALL_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/RECALL_r09.json"))' 2>/dev/null; then
  cp /tmp/RECALL_r09.json /root/repo/RECALL_r09.json
  echo "RECALL_EXIT=0 WROTE=RECALL_r09.json" >> $STATUS
else
  echo "RECALL_EXIT=$RECALL_EXIT ARTIFACT_KEPT" >> $STATUS
fi

# FULL-PACK sf1 point: every query once over the synthetic 10x step
SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r9_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r9_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

echo "ALL_DONE test=$TEST_EXIT gate_fail=$GATE_FAIL" >> $STATUS
