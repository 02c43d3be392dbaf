#!/bin/bash
# Round-10 post-refresh: re-measure the artifacts the late q248
# key/probe scaling changes (q248 now masks the 16-plane ceiling
# bucket to the count-scaled r and scales its flip count
# max(2, r−6); output is bit-identical at the shipped SFs — verified
# against the refresh run's parquet — so the tri-SF oracle gates and
# the correctness story are untouched; only the sf1-regime COST rows
# and the recall/serve artifacts move). RECALL/SERVE run first
# (sequenced by the builder), this script re-runs PERF, SCALE and the
# full-pack SF1 point so every committed timing artifact is a single
# post-change run. Same gating discipline as round10_refresh.sh.
set -x
cd /root/repo
STATUS=/tmp/r10p_status.log
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

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r10p_perf.log 2>&1
run_json_stage PERF /tmp/r10p_perf.log '{"sf".*}' /root/repo/PERF_r10.json $?

sbt -batch "runMain graft.ScaleBench" > /tmp/r10p_scale.log 2>&1
run_json_stage SCALE /tmp/r10p_scale.log '{"sfs".*}' /root/repo/SCALING_r10.json $?

SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r10p_sf1full.log 2>&1
run_json_stage SF1FULL /tmp/r10p_sf1full.log '{"sfs".*}' /root/repo/SCALING_SF1_FULL.json $?

echo "ALL_DONE" >> $STATUS
