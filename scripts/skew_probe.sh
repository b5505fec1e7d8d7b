#!/usr/bin/env bash
# Skew-adversarial probe: the same controlled-bench harness as
# scale_probe.sh, but over graft.SkewData's hot-key variants of
# sf0.1 and sf1 (hot LSH cluster / over-cap chunk digest / dominant
# language / hot event user / duplicated embedding — see SkewData's
# scaladoc). Compare benchdata/skew_<tag>_<rep>.json against the
# uniform probe_<tag>_<rep>.json: a query whose skew/uniform ratio
# explodes is a missing cap or salt.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="dedup_bucket_histogram dedup_lsh_pairs dedup_jaccard \
dedup_components dedup_component_profile dedup_unicode \
dedup_index_merge dedup_index_compact \
dedup_index_rewrite dedup_index_stats text_cdc_dedup text_cdc_remove \
mm_store_gc mm_store_rewrite \
ev_top_users ev_top_users_salted stream_sessionize stream_interval_join \
stream_conversion_window dedup_sorted_neighborhood tf_heavy_delta \
ev_asof_join ev_asof_bucketed ev_overlap_count stream_asof \
doc_sample_quota doc_keep_decision \
emb_near_dup emb_components ann_lsh_buckets ann_lsh_probe \
ann_index_merge ann_index_rewrite dedup_edit_banded \
emb_semdedup doc_target_affinity \
ev_type_pagerank ev_user_pagerank ev_user_trustrank \
doc_sample_weighted \
dedup_containment tf_heavy_hitters stream_vec_dedup \
stream_template_gate stream_topk_value stream_decayed_value \
stream_pii_gate stream_novelty_gate stream_unigram_gate \
stream_session_window dedup_bbit_minhash text_boilerplate_fraction \
dedup_char_ngram dedup_bloom_fpr text_langid_margin \
text_boilerplate_ngrams ann_mmr_diversify dedup_weighted_jaccard \
text_keyterms stream_hourly_wm dedup_minhash_est ann_ivf_pq \
ann_ivf_pq_recall doc_quality_tiers text_contamination \
tf_hll_by_source tf_ngram_novelty text_langid_ngram \
doc_quality_gate stream_affinity_gate stream_static_join \
stream_cdc_strip ev_attribution_linear \
dedup_sn_prune_audit dedup_jaccard_prune_audit"
# dedup_*_prune_audit: round-15 carry — candidate-volume monitors,
# exactly what the hot-cluster variants stress
# the last block (stream_session_window ..) is the round-14 sweep of
# the previously-unprobed >=1 s queries that read a table SkewData
# actually skews (documents/events/embeddings — it copies
# orders/lineitem unmodified, so the relational tail is scale-probe
# only)

export SPARK_GRAFT_WARMUP_NAMES="text_stats,ev_type_stats,q0_scan,mm_meta"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

# skew variants derive from the uniform dirs; sf1 needs scale_probe's
# generated benchdata/sf1 (sentinel-guarded there)
if [ ! -f benchdata/skew0.1/.complete ]; then
  echo "== generating benchdata/skew0.1 (skewed sf0.1) =="
  rm -rf benchdata/skew0.1
  sbt -batch "runMain graft.SkewData /root/testdata/sf0.1 benchdata/skew0.1"
  touch benchdata/skew0.1/.complete
fi
if [ -f benchdata/sf1/.complete ] && [ ! -f benchdata/skew1/.complete ]; then
  echo "== generating benchdata/skew1 (skewed sf1) =="
  rm -rf benchdata/skew1
  sbt -batch "runMain graft.SkewData benchdata/sf1 benchdata/skew1"
  touch benchdata/skew1/.complete
fi

# uniform reference runs (same query list, same warmup) so every
# skew/uniform ratio is apples-to-apples
for tag_dir in "unif0.1:/root/testdata/sf0.1" "skew0.1:benchdata/skew0.1" \
    "unif1:benchdata/sf1" "skew1:benchdata/skew1"; do
  tag="${tag_dir%%:*}"; dir="${tag_dir#*:}"
  [ -d "$dir" ] || { echo "skip $tag (no dataset)"; continue; }
  case "$dir" in benchdata/*)
    [ -f "$dir/.complete" ] || { echo "skip $tag (incomplete)"; continue; } ;;
  esac
  for rep in 1 2 3; do
    # resumable: a rep is done only if its cached JSON covers the
    # CURRENT query list (a grown list re-measures)
    if [ -f "benchdata/${tag}_${rep}.json" ] && \
        python3 -c "import json,sys; d=json.load(open(sys.argv[1])); \
sys.exit(0 if set(sys.argv[2:]) <= set(d.get('queries',{})) else 1)" \
        "benchdata/${tag}_${rep}.json" $QUERIES; then
      echo "== $tag rep $rep (resumed from cache) =="
      continue
    fi
    echo "== $tag rep $rep =="
    SPARK_GRAFT_SF_DIR="$dir" scripts/java_bench.sh graft.Bench $QUERIES \
      >/dev/null 2>&1
    cp bench_result.json "benchdata/${tag}_${rep}.json"
  done
done
echo "done"
