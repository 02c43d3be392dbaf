#!/bin/bash
# Round-7 artifact refresh: suite, tri-SF oracle gate, PERF, SCALING,
# STREAMBENCH, bench — sequential so sbt/Spark never contend.
set -x
cd /root/repo
rm -f /tmp/r7_status.log
sbt -batch test > /tmp/r7_test.log 2>&1
echo "TEST_EXIT=$? $(grep -E 'Tests: succeeded' /tmp/r7_test.log | tail -1)" >> /tmp/r7_status.log
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r7_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r7_$sf" > /tmp/r7_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r7_$sf > /tmp/r7_oracle_$sf.log 2>&1
  echo "GATE_sf$sf=$? $(tail -1 /tmp/r7_oracle_$sf.log)" >> /tmp/r7_status.log
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r7_perf.log 2>&1
echo "PERF_EXIT=$?" >> /tmp/r7_status.log
PERF_JSON=$(grep -o '{"sf".*}' /tmp/r7_perf.log | tail -1)
[ -n "$PERF_JSON" ] && echo "$PERF_JSON" > /root/repo/PERF_r07.json || echo "PERF_JSON_MISSING" >> /tmp/r7_status.log
sbt -batch "runMain graft.ScaleBench" > /tmp/r7_scale.log 2>&1
echo "SCALE_EXIT=$?" >> /tmp/r7_status.log
SCALE_JSON=$(grep -o '{"sfs".*}' /tmp/r7_scale.log | tail -1)
[ -n "$SCALE_JSON" ] && echo "$SCALE_JSON" > /root/repo/SCALING_r07.json || echo "SCALE_JSON_MISSING" >> /tmp/r7_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench STREAMBENCH_r07.json" > /tmp/r7_stream.log 2>&1
echo "STREAM_EXIT=$?" >> /tmp/r7_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r7_bench.log 2>&1
echo "BENCH_EXIT=$?" >> /tmp/r7_status.log
sbt -batch "runMain graft.PlanDump" > /tmp/r7_plans.log 2>&1
echo "PLANS_EXIT=$?" >> /tmp/r7_status.log
sbt -batch "runMain graft.IterScale ITERSCALE_r07.json" > /tmp/r7_iter.log 2>&1
echo "ITER_EXIT=$?" >> /tmp/r7_status.log
echo "ALL_DONE" >> /tmp/r7_status.log
