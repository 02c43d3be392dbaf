#!/bin/bash
# Round-8 artifact refresh: suite, tri-SF oracle gate, PERF, SCALING,
# STREAMBENCH, bench, plans, ITERSCALE, SERVE (point-query latency),
# and the FULL-PACK sf1 scaling point — sequential so sbt/Spark never
# contend. The bench stage's final stdout line is now the raw JSON
# (run/outputStrategy=StdoutOutput + showSuccess=false), so any tail
# capture parses it whole.
set -x
cd /root/repo
rm -f /tmp/r8_status.log
sbt -batch test > /tmp/r8_test.log 2>&1
echo "TEST_EXIT=$? $(grep -E 'Tests: succeeded' /tmp/r8_test.log | tail -1)" >> /tmp/r8_status.log
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r8_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r8_$sf" > /tmp/r8_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r8_$sf > /tmp/r8_oracle_$sf.log 2>&1
  echo "GATE_sf$sf=$? $(tail -1 /tmp/r8_oracle_$sf.log)" >> /tmp/r8_status.log
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r8_perf.log 2>&1
echo "PERF_EXIT=$?" >> /tmp/r8_status.log
PERF_JSON=$(grep -o '{"sf".*}' /tmp/r8_perf.log | tail -1)
[ -n "$PERF_JSON" ] && echo "$PERF_JSON" > /root/repo/PERF_r08.json || echo "PERF_JSON_MISSING" >> /tmp/r8_status.log
sbt -batch "runMain graft.ScaleBench" > /tmp/r8_scale.log 2>&1
echo "SCALE_EXIT=$?" >> /tmp/r8_status.log
SCALE_JSON=$(grep -o '{"sfs".*}' /tmp/r8_scale.log | tail -1)
[ -n "$SCALE_JSON" ] && echo "$SCALE_JSON" > /root/repo/SCALING_r08.json || echo "SCALE_JSON_MISSING" >> /tmp/r8_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench STREAMBENCH_r08.json" > /tmp/r8_stream.log 2>&1
echo "STREAM_EXIT=$?" >> /tmp/r8_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r8_bench.log 2>&1
echo "BENCH_EXIT=$? last_line_parses=$(tail -1 /tmp/r8_bench.log | python3 -c 'import json,sys; json.load(sys.stdin); print(1)' 2>/dev/null)" >> /tmp/r8_status.log
sbt -batch "runMain graft.PlanDump" > /tmp/r8_plans.log 2>&1
echo "PLANS_EXIT=$?" >> /tmp/r8_status.log
sbt -batch "runMain graft.IterScale ITERSCALE_r08.json" > /tmp/r8_iter.log 2>&1
echo "ITER_EXIT=$?" >> /tmp/r8_status.log
sbt -batch "runMain graft.ServeBench SERVE_r08.json" > /tmp/r8_serve.log 2>&1
echo "SERVE_EXIT=$?" >> /tmp/r8_status.log
# FULL-PACK sf1 point (VERDICT r7 "Next" #5): every query once over the
# synthetic 10x step, extending superlinear=[] to the 1000x span for the
# whole pack, not just the 29-query heavy set.
if [ ! -d testdata-sf0.1-synth/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 0.1 /root/repo/testdata-sf0.1-synth" > /tmp/r8_synth01.log 2>&1
fi
if [ ! -d testdata-sf1/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 1 /root/repo/testdata-sf1" > /tmp/r8_synth1.log 2>&1
fi
SPARK_GRAFT_BENCH_REPEATS=1 sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r8_sf1full.log 2>&1
echo "SF1FULL_EXIT=$?" >> /tmp/r8_status.log
SF1_JSON=$(grep -o '{"sfs".*}' /tmp/r8_sf1full.log | tail -1)
[ -n "$SF1_JSON" ] && echo "$SF1_JSON" > /root/repo/SCALING_SF1_FULL.json || echo "SF1FULL_JSON_MISSING" >> /tmp/r8_status.log
echo "ALL_DONE" >> /tmp/r8_status.log
