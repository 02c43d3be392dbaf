#!/bin/bash
# Round-9 post-refresh: re-measure the artifacts the late q256
# addition changes (PERF/SCALING/SF1FULL gain a 249th query, RECALL
# gains the q256 family). The rest of the pack is untouched by q256 —
# its tri-SF + sf1 gates ran at add time — so the full oracle gate is
# not re-run here. Same gating discipline as round9_refresh.sh: no
# artifact overwrite unless the stage exited 0 and the JSON parses.
set -x
cd /root/repo
STATUS=/tmp/r9p_status.log
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

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r9p_perf.log 2>&1
run_json_stage PERF /tmp/r9p_perf.log '{"sf".*}' /root/repo/PERF_r09.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r9p_scale.log 2>&1
run_json_stage SCALE /tmp/r9p_scale.log '{"sfs".*}' /root/repo/SCALING_r09.json $?

SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r9p_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r9p_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.RecallBench /tmp/RECALL_r09.json" > /tmp/r9p_recall.log 2>&1
RECALL_EXIT=$?
if [ $RECALL_EXIT -eq 0 ] && python3 -c 'import json; json.load(open("/tmp/RECALL_r09.json"))' 2>/dev/null; then
  cp /tmp/RECALL_r09.json /root/repo/RECALL_r09.json
  echo "RECALL_EXIT=0 WROTE=RECALL_r09.json" >> $STATUS
else
  echo "RECALL_EXIT=$RECALL_EXIT ARTIFACT_KEPT" >> $STATUS
fi

echo "ALL_DONE" >> $STATUS
