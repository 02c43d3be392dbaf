#!/bin/bash
# Round-8 post-refresh batch: gate + measure the late additions (q255
# residual IVFPQ, the PlanDump build/serve split, base-snapshot
# prebuild) and refresh the artifacts they touch. Sequential — one sbt
# at a time.
set -x
cd /root/repo
rm -f /tmp/r8p_status.log
sbt -batch test > /tmp/r8p_test.log 2>&1
echo "TEST_EXIT=$? $(grep -E 'Tests: succeeded' /tmp/r8p_test.log | tail -1)" >> /tmp/r8p_status.log
for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r8p_$sf
  SPARK_GRAFT_ONLY="q255_ivfpq_residual,q253_ivfpq_serving,q247_knn_graph,q250_knn_incremental,q33_embedding_neardup,q112_semantic_dedup,q120_crossmodal_agreement,q208_semantic_incremental,q209_semantic_best_of_cluster" \
    sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r8p_$sf" > /tmp/r8p_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r8p_$sf > /tmp/r8p_oracle_$sf.log 2>&1
  echo "GATE_sf$sf OK=$(grep -c '^OK' /tmp/r8p_oracle_$sf.log)/9" >> /tmp/r8p_status.log
done
sbt -batch "runMain graft.PlanDump" > /tmp/r8p_plans.log 2>&1
echo "PLANS_EXIT=$?" >> /tmp/r8p_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.PerfProfile" > /tmp/r8p_perf.log 2>&1
echo "PERF_EXIT=$?" >> /tmp/r8p_status.log
PERF_JSON=$(grep -o '{"sf".*}' /tmp/r8p_perf.log | tail -1)
[ -n "$PERF_JSON" ] && echo "$PERF_JSON" > /root/repo/PERF_r08.json || echo "PERF_JSON_MISSING" >> /tmp/r8p_status.log
# q255 scaling points, merged into the round artifacts (same
# ScaleBench discipline as the full runs; merge documented in ENGINE.md)
SPARK_GRAFT_ONLY="q255_ivfpq_residual,q112_semantic_dedup,q208_semantic_incremental,q33_embedding_neardup,q209_semantic_best_of_cluster,q120_crossmodal_agreement" sbt -batch "runMain graft.ScaleBench" > /tmp/r8p_scale_q255.log 2>&1
echo "SCALE_Q255_EXIT=$?" >> /tmp/r8p_status.log
SPARK_GRAFT_ONLY="q255_ivfpq_residual,q112_semantic_dedup,q208_semantic_incremental,q33_embedding_neardup,q209_semantic_best_of_cluster,q120_crossmodal_agreement" SPARK_GRAFT_BENCH_REPEATS=1 \
  sbt -batch "runMain graft.ScaleBench /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" > /tmp/r8p_sf1_q255.log 2>&1
echo "SF1_Q255_EXIT=$?" >> /tmp/r8p_status.log
python3 - <<'EOF'
import json
def merge(dst_path, src_log):
    with open(src_log) as f:
        m = [l for l in f if l.startswith('{"sfs"')]
    src = json.loads(m[-1])
    dst = json.load(open(dst_path))
    dst['queries'].update(src['queries'])
    stale = set(src['queries'])
    dst['superlinear'] = sorted(
        (set(dst['superlinear']) - stale) | set(src['superlinear']))
    json.dump(dst, open(dst_path, 'w'), separators=(',', ':'))
    print('merged', list(src['queries']), '->', dst_path)
merge('/root/repo/SCALING_r08.json', '/tmp/r8p_scale_q255.log')
merge('/root/repo/SCALING_SF1_FULL.json', '/tmp/r8p_sf1_q255.log')
EOF
echo "MERGE_EXIT=$?" >> /tmp/r8p_status.log
# serving latency incl. the synthetic sf1 point (1000x span)
SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
  sbt -batch "runMain graft.ServeBench SERVE_r08.json" > /tmp/r8p_serve.log 2>&1
echo "SERVE_EXIT=$?" >> /tmp/r8p_status.log
echo "ALL_DONE" >> /tmp/r8p_status.log
