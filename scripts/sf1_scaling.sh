#!/bin/bash
# sf1 heavy-set scaling point (VERDICT r6 "Next" #6).
#
# The driver ships sf<=0.1, so the sf1 point comes from graft.SynthData
# (deterministic seeded-hash generator, distribution-matched to the
# driver's tables; timing-only, never oracle gates). The 4-point curve
# runs the ~25 heaviest data-scaling queries (from PERF_r06) over:
#   real sf0.01, real sf0.1, synth sf0.1, synth sf1
# ScaleBench's flagged ratio (last/prev) is then synth sf1 / synth
# sf0.1 — a clean 10x step on one generator — while the synth-vs-real
# sf0.1 columns calibrate generator comparability.
#
# Output: SCALING_SF1.json in the repo root.
set -e
cd /root/repo

HEAVY="q1_pricing_summary,q3_revenue_by_nation,q217_returned_items,q237_shipping_priority,q26_exact_dedup,q28_lsh_band_pairs,q31_ngram_jaccard,q33_embedding_neardup,q54_ml_lsh_pairs,q56_als_all_recommend,q86_incremental_dedup,q89_dedup_recall,q93_subword_tokens,q100_tfidf_keywords,q101_textrank,q103_exact_substrings,q109_span_purge,q119_cooccurrence_triangles,q129_mmr_rerank,q143_association_rules,q153_prefix_join,q242_segment_join,q157_phash_dedup,q180_entity_clusters,q202_set_cover,q238_ivf_sq8_serving,q244_index_compaction,q245_filtered_ann,q247_knn_graph,q253_ivfpq_serving,q255_ivfpq_residual,q112_semantic_dedup,q208_semantic_incremental"

if [ ! -d testdata-sf0.1-synth/lineitem.parquet ]; then
  echo "[sf1] generating synth sf0.1"
  sbt -batch "runMain graft.SynthData 0.1 /root/repo/testdata-sf0.1-synth" \
    2>&1 | tail -3
fi
if [ ! -d testdata-sf1/lineitem.parquet ]; then
  echo "[sf1] generating synth sf1"
  sbt -batch "runMain graft.SynthData 1 /root/repo/testdata-sf1" \
    2>&1 | tail -3
fi

echo "[sf1] running heavy-set ScaleBench over 4 points"
SPARK_GRAFT_ONLY="$HEAVY" SPARK_GRAFT_BENCH_REPEATS=2 \
  sbt -batch "runMain graft.ScaleBench /root/testdata/sf0.01 /root/testdata/sf0.1 /root/repo/testdata-sf0.1-synth /root/repo/testdata-sf1" \
  2>&1 | tee /tmp/sf1_scaling_full.log | grep -o '{"sfs".*}' \
  > SCALING_SF1.json
echo "[sf1] DONE_SF1_SCALING"
