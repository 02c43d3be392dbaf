#!/bin/bash
# Round-12 artifact refresh: suite, tri-SF oracle gate, a TARGETED
# synthetic-sf1 gate for the count-scaled probe/IMI/√n regime (now incl.
# q260 — the composed IVFPQ+refine on the √n geometry), PERF, SCALING,
# STREAMBENCH, bench, plans, ITERSCALE, SERVE (both corpus arms; adds
# the ivfpq_refine_sqrt family; the clustered sweep stops at sf1 — the
# sf10 decade-past-sf1 point is measured via ProbeLab for the FLAT
# scan-budget family, because the PQ families train k_pq=256 codebooks
# on the full 200k corpus, a measured multi-hour Lloyd-assignment job;
# the sampled-training quantizer is the named next-round design),
# RECALL (a GATE: exit 2 = floor violation or the clustered-arm
# structure ratio failed; clustered floors now cover ALL swept
# families), RECALL_CURVE (both arms; imi_sqrt sweeps at the shipped
# SQRT_ROUNDS router), and the FULL-PACK sf1 scaling point. EVERY
# producing stage (incl. STREAMBENCH and ITERSCALE — round-11 ADVICE
# #2) writes to /tmp first and promotes only on exit 0 + JSON parse;
# tmp artifacts are rm -f'd BEFORE each producing run, so a crash can
# never promote a stale file from a previous attempt.
set -x
cd /root/repo
STATUS=/tmp/r12_status.log
rm -f $STATUS

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

# synthetic corpora for the sf1 regime (deterministic; rebuilt if absent)
if [ ! -d testdata-sf0.1-synth/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 0.1 /root/repo/testdata-sf0.1-synth" 2>&1 | tail -2
fi
if [ ! -d testdata-sf1/lineitem.parquet ]; then
  sbt -batch "runMain graft.SynthData 1 /root/repo/testdata-sf1" 2>&1 | tail -2
fi
# planted-cluster companions (embeddings only — the recall/serve arm);
# sf10 (200k vectors) is the decade-past-sf1 point the √n family's
# sublinear claim is really about
for sf in 0.01 0.1 1 10; do
  if [ ! -d "testdata-sf${sf}-clustered/embeddings.parquet" ]; then
    sbt -batch "runMain graft.SynthData $sf /root/repo/testdata-sf${sf}-clustered clustered embeddings" 2>&1 | tail -2
  fi
done

TEST_EXIT=skipped
GATE_FAIL=0
if [ -z "$SPARK_GRAFT_SKIP_GATES" ]; then
sbt -batch test > /tmp/r12_test.log 2>&1
TEST_EXIT=$?
echo "TEST_EXIT=$TEST_EXIT $(grep -E 'Tests: succeeded' /tmp/r12_test.log | tail -1)" >> $STATUS

for sf in 0.001 0.01 0.1; do
  rm -rf /tmp/verify_r12_$sf
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r12_$sf" > /tmp/r12_verify_$sf.log 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf$sf /tmp/verify_r12_$sf > /tmp/r12_oracle_$sf.log 2>&1
  G=$?
  [ $G -ne 0 ] && GATE_FAIL=1
  echo "GATE_sf$sf=$G $(tail -1 /tmp/r12_oracle_$sf.log)" >> $STATUS
done

# targeted sf1 gate: the queries whose count-scaled regime (r=11 bits,
# 256 IMI cells, nprobe=16, k_pq=64, the 196-cell √n family with the
# round-12 scan-budget route + 4-round codebooks) only engages here
SF1_QS="q34_lsh_ann,q38_ann_recall,q78_ann_recall_summary,q251_trained_ivf,q253_ivfpq_serving,q255_ivfpq_residual,q256_scaled_ivf,q257_ivfpq_refine,q258_imi_sqrt,q259_random_route,q260_ivfpq_sqrt_refine"
SF1_N=11
rm -rf /tmp/verify_r12_sf1
SPARK_GRAFT_ONLY="$SF1_QS" sbt -batch "runMain graft.Verify /root/repo/testdata-sf1 /tmp/verify_r12_sf1" > /tmp/r12_verify_sf1.log 2>&1
python3 scripts/oracle_check.py /root/repo/testdata-sf1 /tmp/verify_r12_sf1 > /tmp/r12_oracle_sf1.log 2>&1
SF1_OK=$(grep -cE '^OK' /tmp/r12_oracle_sf1.log)
echo "GATE_sf1_targeted ok=$SF1_OK/$SF1_N" >> $STATUS
[ "$SF1_OK" -ne "$SF1_N" ] && GATE_FAIL=1
fi # SPARK_GRAFT_SKIP_GATES

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r12_bench.log 2>&1
echo "BENCH_EXIT=$? last_line_parses=$(tail -1 /tmp/r12_bench.log | python3 -c 'import json,sys; json.load(sys.stdin); print(1)' 2>/dev/null)" >> $STATUS

rm -f /tmp/SERVE_r12.json
SPARK_GRAFT_SERVE_SFS="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_SERVE_CLUSTERED_SFS="/root/repo/testdata-sf0.01-clustered,/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.ServeBench /tmp/SERVE_r12.json" > /tmp/r12_serve.log 2>&1
promote SERVE /tmp/SERVE_r12.json /root/repo/SERVE_r12.json $?

# recall GATE: exit 2 = floor violation (incl. the clustered-arm
# structure pin). The artifact (with its violations array) is still
# the round's record either way — but only a freshly-written one.
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
[ $RECALL_EXIT -ne 0 ] && GATE_FAIL=1

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

# recall-vs-nprobe operating curve, BOTH corpus arms; the imi_sqrt
# family sweeps at the shipped 4-round router
rm -f /tmp/RECALL_CURVE_r12.json
SPARK_GRAFT_CURVE_SFS="/root/testdata/sf0.1,/root/repo/testdata-sf1" \
SPARK_GRAFT_CURVE_CLUSTERED_SFS="/root/repo/testdata-sf0.1-clustered,/root/repo/testdata-sf1-clustered" \
  sbt -batch "runMain graft.RecallCurve /tmp/RECALL_CURVE_r12.json" > /tmp/r12_curve.log 2>&1
promote CURVE /tmp/RECALL_CURVE_r12.json /root/repo/RECALL_CURVE_r12.json $?

echo "ALL_DONE test=$TEST_EXIT gate_fail=$GATE_FAIL" >> $STATUS
