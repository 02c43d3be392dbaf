#!/bin/bash
# Final round-6 sweep: suite, tri-SF oracle gate, PERF, SCALING, bench.
set -x
cd /root/repo
rm -f /tmp/r6f_status.log
sbt -batch test > /tmp/r6f_test.log 2>&1
echo "TEST_EXIT=$? $(grep -E 'Tests: succeeded' /tmp/r6f_test.log | tail -1)" >> /tmp/r6f_status.log
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_final_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_final_$sf" > /tmp/r6f_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_final_$sf > /tmp/r6f_oracle_$sf.log 2>&1
  echo "GATE_sf$sf=$? $(tail -1 /tmp/r6f_oracle_$sf.log)" >> /tmp/r6f_status.log
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r6f_perf.log 2>&1
echo "PERF_EXIT=$?" >> /tmp/r6f_status.log
PERF_JSON=$(grep -o '{"sf".*}' /tmp/r6f_perf.log | tail -1)
[ -n "$PERF_JSON" ] && echo "$PERF_JSON" > /root/repo/PERF_r06.json || echo "PERF_JSON_MISSING" >> /tmp/r6f_status.log
sbt -batch "runMain graft.ScaleBench" > /tmp/r6f_scale.log 2>&1
echo "SCALE_EXIT=$?" >> /tmp/r6f_status.log
SCALE_JSON=$(grep -o '{"sfs".*}' /tmp/r6f_scale.log | tail -1)
[ -n "$SCALE_JSON" ] && echo "$SCALE_JSON" > /root/repo/SCALING_r06.json || echo "SCALE_JSON_MISSING" >> /tmp/r6f_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r6f_bench.log 2>&1
echo "BENCH_EXIT=$?" >> /tmp/r6f_status.log
echo "ALL_DONE" >> /tmp/r6f_status.log
