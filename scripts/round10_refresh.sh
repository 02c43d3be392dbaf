#!/bin/bash
# Round-10 artifact refresh: suite, tri-SF oracle gate, a TARGETED
# synthetic-sf1 gate for the count-scaled probe/IMI regime (nprobe=16,
# 256 cells — the regime no shipped SF reaches), PERF, SCALING,
# STREAMBENCH, bench, plans, ITERSCALE, SERVE, RECALL (now a GATE:
# exit 2 = a family fell below its floor — the artifact is still
# written and the failure recorded), RECALL_CURVE, and the FULL-PACK
# sf1 scaling point. Every artifact overwrite is gated on its stage's
# exit code (and JSON parse) — a red run records its failure and keeps
# the previous committed artifact.
set -x
cd /root/repo
STATUS=/tmp/r10_status.log
rm -f $STATUS

run_json_stage () { # name, log, grep-pattern, artifact, rc
  local name=$1 log=$2 pat=$3 art=$4 rc=$5
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

# synthetic corpora for the sf1 regime (deterministic; rebuilt if absent)
if [ ! -d testdata-sf0.1-synth/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 0.1 /root/repo/testdata-sf0.1-synth" 2>&1 | tail -2
fi
if [ ! -d testdata-sf1/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 1 /root/repo/testdata-sf1" 2>&1 | tail -2
fi

sbt -batch test > /tmp/r10_test.log 2>&1
TEST_EXIT=$?
echo "TEST_EXIT=$TEST_EXIT $(grep -E 'Tests: succeeded' /tmp/r10_test.log | tail -1)" >> $STATUS

GATE_FAIL=0
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r10_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r10_$sf" > /tmp/r10_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r10_$sf > /tmp/r10_oracle_$sf.log 2>&1
  G=$?
  [ $G -ne 0 ] && GATE_FAIL=1
  echo "GATE_sf$sf=$G $(tail -1 /tmp/r10_oracle_$sf.log)" >> $STATUS
done

# targeted sf1 gate: the queries whose count-scaled regime (r=11 bits,
# 256 IMI cells, nprobe=16, Hamming-1 probe sets) only engages here
SF1_QS="q34_lsh_ann,q38_ann_recall,q78_ann_recall_summary,q251_trained_ivf,q253_ivfpq_serving,q255_ivfpq_residual,q256_scaled_ivf,q257_ivfpq_refine"
rm -rf /tmp/verify_r10_sf1
SPARK_GRAFT_ONLY="$SF1_QS" sbt -batch "runMain graft.Verify /root/repo/testdata-sf1 /tmp/verify_r10_sf1" > /tmp/r10_verify_sf1.log 2>&1
python3 scripts/oracle_check.py /root/repo/testdata-sf1 /tmp/verify_r10_sf1 > /tmp/r10_oracle_sf1.log 2>&1
SF1_OK=$(grep -cE '^OK' /tmp/r10_oracle_sf1.log)
echo "GATE_sf1_targeted ok=$SF1_OK/8" >> $STATUS
[ "$SF1_OK" -ne 8 ] && GATE_FAIL=1

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r10_perf.log 2>&1
run_json_stage PERF /tmp/r10_perf.log '{"sf".*}' /root/repo/PERF_r10.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r10_scale.log 2>&1
run_json_stage SCALE /tmp/r10_scale.log '{"sfs".*}' /root/repo/SCALING_r10.json $?

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench STREAMBENCH_r10.json" > /tmp/r10_stream.log 2>&1
echo "STREAM_EXIT=$?" >> $STATUS

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r10_bench.log 2>&1
echo "BENCH_EXIT=$? last_line_parses=$(tail -1 /tmp/r10_bench.log | python3 -c 'import json,sys; json.load(sys.stdin); print(1)' 2>/dev/null)" >> $STATUS

sbt -batch "runMain graft.PlanDump" > /tmp/r10_plans.log 2>&1
echo "PLANS_EXIT=$?" >> $STATUS

sbt -batch "runMain graft.IterScale ITERSCALE_r10.json" > /tmp/r10_iter.log 2>&1
echo "ITER_EXIT=$?" >> $STATUS

SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.ServeBench /tmp/SERVE_r10.json" > /tmp/r10_serve.log 2>&1
SERVE_EXIT=$?
if [ $SERVE_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/SERVE_r10.json"))' 2>/dev/null; then
  cp /tmp/SERVE_r10.json /root/repo/SERVE_r10.json
  echo "SERVE_EXIT=0 WROTE=SERVE_r10.json" >> $STATUS
else
  echo "SERVE_EXIT=$SERVE_EXIT ARTIFACT_KEPT" >> $STATUS
fi

# recall GATE: exit 2 = floor violation. The artifact (with its
# violations array) is still the round's record either way.
SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.RecallBench /tmp/RECALL_r10.json" > /tmp/r10_recall.log 2>&1
RECALL_EXIT=$?
if python3 -c 'import json; json.load(open("/tmp/RECALL_r10.json"))' 2>/dev/null; then
  cp /tmp/RECALL_r10.json /root/repo/RECALL_r10.json
  echo "RECALL_EXIT=$RECALL_EXIT WROTE=RECALL_r10.json" >> $STATUS
else
  echo "RECALL_EXIT=$RECALL_EXIT ARTIFACT_KEPT" >> $STATUS
fi
[ $RECALL_EXIT -ne 0 ] && GATE_FAIL=1

# recall-vs-nprobe operating curve (the probe divisor's evidence)
SPARK_GRAFT_CURVE_SFS="/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.RecallCurve /tmp/RECALL_CURVE_r10.json" > /tmp/r10_curve.log 2>&1
CURVE_EXIT=$?
if [ $CURVE_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/RECALL_CURVE_r10.json"))' 2>/dev/null; then
  cp /tmp/RECALL_CURVE_r10.json /root/repo/RECALL_CURVE_r10.json
  echo "CURVE_EXIT=0 WROTE=RECALL_CURVE_r10.json" >> $STATUS
else
  echo "CURVE_EXIT=$CURVE_EXIT ARTIFACT_KEPT" >> $STATUS
fi

SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r10_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r10_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

echo "ALL_DONE test=$TEST_EXIT gate_fail=$GATE_FAIL" >> $STATUS
