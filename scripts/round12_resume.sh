#!/bin/bash
# Resume of round12_refresh.sh from the SERVE stage (the prior run was
# killed mid-SERVE when its controlling session ended). Bench + gates
# already completed and are recorded in /tmp/r12_status.log /
# /tmp/r12_bench.log. Same promote-on-green discipline.
#
# sf10 NOTE: the SERVE/RECALL clustered sweeps stop at sf1 here where
# round12_refresh.sh included testdata-sf10-clustered. Measured reason:
# the PQ families (q253/q255/q257/q260 shapes) train their k_pq=256
# residual codebooks on the FULL corpus — at 200k vectors that is a
# 12.8M-subspace-row Lloyd chain whose assignment join materializes
# ~3.3B pair rows per round (observed: >65 min in the sf10 block,
# 9.8 GB shuffle mid-flight, single straggler task >28 min CPU).
# Full-corpus training is exactly what production systems do NOT do
# (faiss trains on a ~max(256·k, 100k)-point sample); the sampled-
# training coarse/PQ quantizer is the named next-round design, and the
# sf10 point for the FLAT √n family (no PQ chain — the scan-budget
# route itself) is measured and recorded via ProbeLab in ENGINE.md.
set -x
cd /root/repo
STATUS=/tmp/r12_status.log

promote () { # name, tmpfile, artifact, rc
  local name=$1 tmp=$2 art=$3 rc=$4
  if [ "$rc" -eq 0 ] && python3 -c "import json; json.load(open('$tmp'))" 2>/dev/null; then
    cp "$tmp" "$art"
    echo "${name}_EXIT=0 WROTE=$art" >> $STATUS
  else
    echo "${name}_EXIT=$rc ARTIFACT_KEPT" >> $STATUS
    return 1
  fi
}

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

rm -f /tmp/SERVE_r12.json
SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_SERVE_CLUSTERED_SFS="/root/repo/testdata-sf0.01-clustered,/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.ServeBench /tmp/SERVE_r12.json" > /tmp/r12_serve.log 2>&1
promote SERVE /tmp/SERVE_r12.json /root/repo/SERVE_r12.json $?

rm -f /tmp/RECALL_r12.json
SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_RECALL_CLUSTERED_SFS="/root/repo/testdata-sf0.01-clustered,/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.RecallBench /tmp/RECALL_r12.json" > /tmp/r12_recall.log 2>&1
RECALL_EXIT=$?
if python3 -c 'import json; json.load(open("/tmp/RECALL_r12.json"))' 2>/dev/null; then
  cp /tmp/RECALL_r12.json /root/repo/RECALL_r12.json
  echo "RECALL_EXIT=$RECALL_EXIT WROTE=RECALL_r12.json" >> $STATUS
else
  echo "RECALL_EXIT=$RECALL_EXIT ARTIFACT_KEPT" >> $STATUS
fi

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r12_perf.log 2>&1
run_json_stage PERF /tmp/r12_perf.log '{"sf".*}' /root/repo/PERF_r12.json $?

SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r12_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r12_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r12_scale.log 2>&1
run_json_stage SCALE /tmp/r12_scale.log '{"sfs".*}' /root/repo/SCALING_r12.json $?

rm -f /tmp/STREAMBENCH_r12.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench /tmp/STREAMBENCH_r12.json" > /tmp/r12_stream.log 2>&1
promote STREAM /tmp/STREAMBENCH_r12.json /root/repo/STREAMBENCH_r12.json $?

rm -f /tmp/ITERSCALE_r12.json
sbt -batch "runMain graft.IterScale /tmp/ITERSCALE_r12.json" > /tmp/r12_iter.log 2>&1
promote ITER /tmp/ITERSCALE_r12.json /root/repo/ITERSCALE_r12.json $?

sbt -batch "runMain graft.PlanDump" > /tmp/r12_plans.log 2>&1
echo "PLANS_EXIT=$?" >> $STATUS

rm -f /tmp/RECALL_CURVE_r12.json
SPARK_GRAFT_CURVE_SFS="/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_CURVE_CLUSTERED_SFS="/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.RecallCurve /tmp/RECALL_CURVE_r12.json" > /tmp/r12_curve.log 2>&1
promote CURVE /tmp/RECALL_CURVE_r12.json /root/repo/RECALL_CURVE_r12.json $?

echo "RESUME_ALL_DONE" >> $STATUS
