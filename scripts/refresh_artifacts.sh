#!/bin/bash
# Dev-only round-artifact refresh: full suite, full oracle gate, PERF,
# SCALING — sequential so sbt/Spark never contend for the JVM or target.
set -x
cd /root/repo
rm -f /tmp/r6_status.log
sbt -batch test > /tmp/r6_test.log 2>&1
echo "TEST_EXIT=$?" >> /tmp/r6_status.log
rm -rf /tmp/verify_out
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out" > /tmp/r6_verify.log 2>&1
echo "VERIFY_EXIT=$?" >> /tmp/r6_status.log
python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out > /tmp/r6_oracle.log 2>&1
echo "ORACLE_EXIT=$? $(tail -1 /tmp/r6_oracle.log)" >> /tmp/r6_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r6_perf.log 2>&1
echo "PERF_EXIT=$?" >> /tmp/r6_status.log
PERF_JSON=$(grep -o '{"sf".*}' /tmp/r6_perf.log | tail -1)
[ -n "$PERF_JSON" ] && echo "$PERF_JSON" > /root/repo/PERF_r06.json || echo "PERF_JSON_MISSING" >> /tmp/r6_status.log
sbt -batch "runMain graft.ScaleBench" > /tmp/r6_scale.log 2>&1
echo "SCALE_EXIT=$?" >> /tmp/r6_status.log
SCALE_JSON=$(grep -o '{"sfs".*}' /tmp/r6_scale.log | tail -1)
[ -n "$SCALE_JSON" ] && echo "$SCALE_JSON" > /root/repo/SCALING_r06.json || echo "SCALE_JSON_MISSING" >> /tmp/r6_status.log
echo "ALL_DONE" >> /tmp/r6_status.log
