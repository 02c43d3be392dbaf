#!/bin/bash
# Round-11 artifact refresh: suite, tri-SF oracle gate, a TARGETED
# synthetic-sf1 gate for the count-scaled probe/IMI/√n regime (nprobe=16,
# 256 cells, k_pq=64, the 196-cell √n family — the regime no shipped SF
# reaches), PERF, SCALING, STREAMBENCH, bench, plans, ITERSCALE, SERVE
# (now per corpus ARM: uniform + planted-cluster companions, with the
# ivf_sqrt family), RECALL (a GATE: exit 2 = a family fell below its
# per-(family, corpus) floor OR the clustered-arm structure-exploitation
# ratio failed), RECALL_CURVE (both arms + the imi_sqrt sweep), and the
# FULL-PACK sf1 scaling point. Every artifact overwrite is gated on its
# stage's exit code (and JSON parse) — a red run records its failure and
# keeps the previous committed artifact. Tmp artifacts are rm -f'd
# BEFORE each producing run, so a crash can never promote a stale file
# from a previous attempt (round-10 ADVICE #2).
set -x
cd /root/repo
STATUS=/tmp/r11_status.log
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
# planted-cluster companions (embeddings only — the recall/serve arm)
for sf in 0.01 0.1 1; do
  if [ ! -d "testdata-sf${sf}-clustered/embeddings.parquet" ]; then
    sbt -batch "runMain graft.SynthData $sf /root/repo/testdata-sf${sf}-clustered clustered embeddings" 2>&1 | tail -2
  fi
done

sbt -batch test > /tmp/r11_test.log 2>&1
TEST_EXIT=$?
echo "TEST_EXIT=$TEST_EXIT $(grep -E 'Tests: succeeded' /tmp/r11_test.log | tail -1)" >> $STATUS

GATE_FAIL=0
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r11_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r11_$sf" > /tmp/r11_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r11_$sf > /tmp/r11_oracle_$sf.log 2>&1
  G=$?
  [ $G -ne 0 ] && GATE_FAIL=1
  echo "GATE_sf$sf=$G $(tail -1 /tmp/r11_oracle_$sf.log)" >> $STATUS
done

# targeted sf1 gate: the queries whose count-scaled regime (r=11 bits,
# 256 IMI cells, nprobe=16, k_pq=64, the 196-cell √n family) only
# engages here
SF1_QS="q34_lsh_ann,q38_ann_recall,q78_ann_recall_summary,q251_trained_ivf,q253_ivfpq_serving,q255_ivfpq_residual,q256_scaled_ivf,q257_ivfpq_refine,q258_imi_sqrt,q259_random_route"
SF1_N=10
rm -rf /tmp/verify_r11_sf1
SPARK_GRAFT_ONLY="$SF1_QS" sbt -batch "runMain graft.Verify /root/repo/testdata-sf1 /tmp/verify_r11_sf1" > /tmp/r11_verify_sf1.log 2>&1
python3 scripts/oracle_check.py /root/repo/testdata-sf1 /tmp/verify_r11_sf1 > /tmp/r11_oracle_sf1.log 2>&1
SF1_OK=$(grep -cE '^OK' /tmp/r11_oracle_sf1.log)
echo "GATE_sf1_targeted ok=$SF1_OK/$SF1_N" >> $STATUS
[ "$SF1_OK" -ne "$SF1_N" ] && GATE_FAIL=1

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r11_perf.log 2>&1
run_json_stage PERF /tmp/r11_perf.log '{"sf".*}' /root/repo/PERF_r11.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r11_scale.log 2>&1
run_json_stage SCALE /tmp/r11_scale.log '{"sfs".*}' /root/repo/SCALING_r11.json $?

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench STREAMBENCH_r11.json" > /tmp/r11_stream.log 2>&1
echo "STREAM_EXIT=$?" >> $STATUS

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r11_bench.log 2>&1
echo "BENCH_EXIT=$? last_line_parses=$(tail -1 /tmp/r11_bench.log | python3 -c 'import json,sys; json.load(sys.stdin); print(1)' 2>/dev/null)" >> $STATUS

sbt -batch "runMain graft.PlanDump" > /tmp/r11_plans.log 2>&1
echo "PLANS_EXIT=$?" >> $STATUS

sbt -batch "runMain graft.IterScale ITERSCALE_r11.json" > /tmp/r11_iter.log 2>&1
echo "ITER_EXIT=$?" >> $STATUS

rm -f /tmp/SERVE_r11.json
SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_SERVE_CLUSTERED_SFS="/root/repo/testdata-sf0.01-clustered,/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.ServeBench /tmp/SERVE_r11.json" > /tmp/r11_serve.log 2>&1
SERVE_EXIT=$?
if [ $SERVE_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/SERVE_r11.json"))' 2>/dev/null; then
  cp /tmp/SERVE_r11.json /root/repo/SERVE_r11.json
  echo "SERVE_EXIT=0 WROTE=SERVE_r11.json" >> $STATUS
else
  echo "SERVE_EXIT=$SERVE_EXIT ARTIFACT_KEPT" >> $STATUS
fi

# recall GATE: exit 2 = floor violation (incl. the clustered-arm
# structure pin). The artifact (with its violations array) is still
# the round's record either way — but only a freshly-written one: the
# tmp file is removed first so a crash can never promote a stale copy.
rm -f /tmp/RECALL_r11.json
SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_RECALL_CLUSTERED_SFS="/root/repo/testdata-sf0.01-clustered,/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.RecallBench /tmp/RECALL_r11.json" > /tmp/r11_recall.log 2>&1
RECALL_EXIT=$?
if python3 -c 'import json; json.load(open("/tmp/RECALL_r11.json"))' 2>/dev/null; then
  cp /tmp/RECALL_r11.json /root/repo/RECALL_r11.json
  echo "RECALL_EXIT=$RECALL_EXIT WROTE=RECALL_r11.json" >> $STATUS
else
  echo "RECALL_EXIT=$RECALL_EXIT ARTIFACT_KEPT" >> $STATUS
fi
[ $RECALL_EXIT -ne 0 ] && GATE_FAIL=1

# recall-vs-nprobe operating curve, BOTH corpus arms + the imi_sqrt
# family (the √n probe knee's evidence)
rm -f /tmp/RECALL_CURVE_r11.json
SPARK_GRAFT_CURVE_SFS="/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_CURVE_CLUSTERED_SFS="/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.RecallCurve /tmp/RECALL_CURVE_r11.json" > /tmp/r11_curve.log 2>&1
CURVE_EXIT=$?
if [ $CURVE_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/RECALL_CURVE_r11.json"))' 2>/dev/null; then
  cp /tmp/RECALL_CURVE_r11.json /root/repo/RECALL_CURVE_r11.json
  echo "CURVE_EXIT=0 WROTE=RECALL_CURVE_r11.json" >> $STATUS
else
  echo "CURVE_EXIT=$CURVE_EXIT ARTIFACT_KEPT" >> $STATUS
fi

SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r11_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r11_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

echo "ALL_DONE test=$TEST_EXIT gate_fail=$GATE_FAIL" >> $STATUS
