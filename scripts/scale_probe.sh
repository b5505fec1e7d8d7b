#!/usr/bin/env bash
# Controlled scale probe: 3x per scale factor, cold-index warm-up so
# the dedup/ANN/BPE index builds land inside their first timed
# consumer. Results land in benchdata/probe_<tag>_<rep>.json.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="dedup_lsh_pairs dedup_components kmeans_train emb_components \
ann_ivf emb_pq_encode tf_bpe_train q1_pricing_summary \
q2_revenue_by_nation q9_rollup q16_distinct_counts q23_percentiles \
text_token_count text_remove_boilerplate text_cdc_dedup mm_near_dup \
mm_cdc_dedup dedup_delta_probe \
doc_keep_decision doc_filter_funnel doc_manifest dedup_edit_distance \
ann_pq_adc dedup_index_merge ann_index_merge mm_cdc_store_merge \
dedup_index_compact ann_index_compact mm_store_gc doc_snapshot_diff \
ev_histogram_quantiles dedup_edit_banded ann_filtered \
doc_snapshot_drift hybrid_rrf dedup_index_rewrite \
dedup_components_delta doc_unigram_score dedup_index_stats \
ev_asof_join ev_overlap_count dedup_kmv_distinct dedup_kmv_merge \
dedup_kmv_overlap dedup_kmv_matrix ev_histogram_merge \
ev_histogram_by_type \
emb_semdedup doc_target_affinity doc_affinity_select \
ev_type_pagerank ev_user_pagerank doc_sample_weighted emb_rand_proj \
ann_proj_rerank doc_affinity_select doc_affinity_select_threshold \
dedup_containment tf_heavy_hitters ev_user_trustrank tf_heavy_delta \
ann_mrr pii_k_anonymity \
q23b_percentiles_approx q30_zorder_layout pii_l_diversity \
pii_release_suppressed \
q31_agg_delta tf_compression_ratio dedup_lsh_precision dedup_unicode dedup_component_profile \
dedup_substring_spans dedup_spans_remove ev_user_hits emb_principal_dir \
q33_topk_delta q34_join_skew doc_length_ks ann_footrule emb_dim_variance \
doc_source_hhi ev_watermark_audit ev_gap_histogram stream_topk_value \
ev_user_triangles ev_user_kcore ev_graph_assortativity \
dedup_hamming_histogram emb_knn_label_agreement emb_class_separation \
q35_basket_lift tf_oov_burst q37_retract_delta ev_session_paths \
dedup_damerau ev_peak_concurrency ev_bot_score text_readability \
ev_cusum_change tf_burstiness doc_decontaminate \
doc_affinity_calibration kmeans_stability ev_conversion_latency \
stream_decayed_value stream_pii_gate stream_novelty_gate \
stream_vec_dedup stream_unigram_gate stream_template_gate \
stream_sessionize stream_cdc_candidates stream_hourly \
stream_dedup_keys stream_takedown_gate stream_ann_upsert \
stream_topk_compact stream_decayed_compact \
ev_peak_concurrency_audit pii_generalization emb_prefix_recall \
tf_kn_prob ann_prefix_rerank ev_anomaly_mad ev_user_lifespan \
dedup_survivor emb_dim_corr q44_spend_deciles \
dedup_jaro_winkler tf_fertility q45_quartile_mobility \
text_encoding_audit tf_vocab_growth ev_autocorr_daily \
tf_good_turing ev_theilsen_trend dedup_sorted_neighborhood \
dedup_sorted_neighborhood_audit dedup_sn_multipass stream_interval_join \
stream_conversion_window doc_kn_rarity \
q46_correlated_spend q47_lateral_topk ev_attribution_position \
dedup_blocking_overlap ev_changepoint_binseg doc_gopher_rules \
stream_session_window dedup_bbit_minhash text_boilerplate_fraction \
dedup_char_ngram dedup_bloom_fpr text_langid_margin \
text_boilerplate_ngrams ann_mmr_diversify dedup_weighted_jaccard \
text_keyterms q32_join_delta stream_hourly_wm q18_large_orders \
q27_profile q27_profile_audit q16_distinct_counts_audit \
dedup_minhash_est q26_grouping_sets dedup_jaccard enrich_pipeline \
dedup_sn_prune_audit dedup_jaccard_prune_audit \
ann_ivf_pq ann_ivf_pq_recall doc_quality_tiers text_cdc_remove \
text_contamination tf_hll_by_source tf_ngram_novelty \
text_langid_ngram doc_quality_gate stream_affinity_gate \
stream_static_join stream_cdc_strip stream_asof q28_ntile \
ev_attribution_linear"
# List history (each block first measured by that round's probe run;
# the resumable cache re-measures every rep whenever the list grows):
#  - ev_peak_concurrency_audit .. emb_prefix_recall-era names through
#    q46_correlated_spend .. doc_gopher_rules: the round-12 post-close
#    carry plus the round-13 additions (dedup_sorted_neighborhood[_audit],
#    dedup_sn_multipass, doc_kn_rarity, stream_conversion_window,
#    dedup_blocking_overlap), first measured by the round-13 run.
#  - stream_session_window .. ev_attribution_linear: the round-14
#    sweep of every previously-unprobed query costing >=1 s at sf0.1
#    (round-13 verdict item 3), plus the q16/q27 audit tiers so the
#    round-14 plan promotions carry side-by-side scale numbers.
#  - dedup_sn_prune_audit, dedup_jaccard_prune_audit: the round-15
#    post-probe carry (the two prune-sizing audits; the jaccard one
#    is new this round alongside the dedup_jaccard size-ratio prune).

# minimal warm-up: one scan per table family, no index builds
export SPARK_GRAFT_WARMUP_NAMES="text_stats,ev_type_stats,q0_scan,mm_meta"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

# the sentinel (written only after ScaleData exits cleanly) guards
# against probing a truncated dataset left by an interrupted run —
# a bare directory check can't tell the difference
if [ ! -f benchdata/sf1/.complete ]; then
  echo "== generating benchdata/sf1 (10x sf0.1) =="
  rm -rf benchdata/sf1
  sbt -batch "runMain graft.ScaleData /root/testdata/sf0.1 benchdata/sf1 10"
  touch benchdata/sf1/.complete
fi

for tag_dir in "sf0.1:/root/testdata/sf0.1" "sf1:benchdata/sf1"; do
  tag="${tag_dir%%:*}"; dir="${tag_dir#*:}"
  for rep in 1 2 3; do
    # resumable: a rep is done only if its cached JSON covers the
    # CURRENT query list (a grown list re-measures; delete the
    # benchdata JSONs to force a full re-measure on new hardware)
    if [ -f "benchdata/probe_${tag}_${rep}.json" ] && \
        python3 -c "import json,sys; d=json.load(open(sys.argv[1])); \
sys.exit(0 if set(sys.argv[2:]) <= set(d.get('queries',{})) else 1)" \
        "benchdata/probe_${tag}_${rep}.json" $QUERIES; then
      echo "== $tag rep $rep (resumed from cache) =="
      continue
    fi
    echo "== $tag rep $rep =="
    SPARK_GRAFT_SF_DIR="$dir" scripts/java_bench.sh graft.Bench $QUERIES \
      >/dev/null 2>&1
    cp bench_result.json "benchdata/probe_${tag}_${rep}.json"
  done
done
echo "done"
