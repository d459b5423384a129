import java.nio.file.{Files, Paths}
val d = "/root/testdata/sf0.001"
val names = Seq("q01_agg", "q03_join_broadcast", "q07_join_nonequi", "q16_topk", "q22_asof_join", "d02_minhash_lsh", "d03_ngram_jaccard", "d05_embedding_neardup", "s02_ann_lsh", "e03_session_window", "q32_topk_per_key", "x05_train_test_split", "x07_contamination", "q34_topk_strategy", "s04_ivf_ann", "q33_bloom_prefilter", "q35_custom_hll", "q36_custom_quantile", "d08_dfcap_jaccard", "q38_kll_quantile", "q39_outer_join", "q40_unpivot", "x10_pii_redact", "e07_interval_join", "m04_arrow_batch", "q41_latest_per_key", "x11_oov_rate", "e08_gapfill", "x12_sequence_pack", "s05_ivf_index_probe", "s06_ivf_batch_probe", "m05_image_decode", "x13_lm_quality", "x15_bpe_tokenize", "q42_zorder_scan", "q43_changelog_apply", "s07_pq_adc", "m06_phash_neardup", "q44_scd2_history", "q45_cms_heavy_hitters", "q46_tree_closure", "e10_interp_gapfill", "x16_temperature_mix", "x17_tfidf_keywords", "m07_audio_decode", "m08_video_decode", "e11_funnel", "q47_kmv_overlap", "q48_incremental_mv", "q49_star_join", "e12_cohort_retention", "d09_incremental_dedup", "e13_xml_extract", "q50_quality_audit", "g01_pagerank", "g02_personalized_pagerank", "d10_entity_resolution", "e14_watermark_audit", "q51_equidepth_bins", "g03_triangle_count", "q52_sweepline_concurrency", "g04_kcore", "x18_collocations", "m09_resize_stats", "x19_chunking", "s09_sq_adc", "g05_hop_distance", "x20_dupspan", "g06_adamic_adar", "d11_semdedup", "q53_correlated_subquery", "e15_ohlc_bars", "q54_lateral_topk", "x21_dedup_clean", "s10_recall_eval", "m10_image_quality", "e16_sketch_rollup", "g07_weighted_sssp", "d12_lsh_eval", "e18_rolling_zscore", "d13_editdist_neardup", "q57_weighted_percentile", "s12_centroid_outliers", "m12_scene_detect", "s13_hard_negatives", "g08_label_propagation", "q59_profile", "q60_snapshot_diff", "e20_ewma", "x24_domain_sim", "x25_nb_domain", "q61_waiting_suppliers", "x26_zipf_fit", "s15_ivfpq_adc", "s16_adc_rerank", "q62_join_size", "m13_curation_pipeline", "c01_curation_pipeline", "c02_retrieval_pipeline", "s17_filtered_ann", "s18_nprobe_sweep", "d15_band_sweep", "m14_audio_neardup", "e21_markov_transitions", "x27_redaction_audit", "s19_pq_quality", "e22_path_mining", "e23_cusum_drift", "d16_cc_pointer_jumping", "s20_sq_bit_sweep", "q63_top_supplier", "e24_periodicity", "s21_filtered_ivfpq", "c04_multimodal_landing", "q64_sales_opportunity", "g09_modularity", "x28_bpe_batch", "q65_market_share", "q66_small_qty_revenue", "q67_order_count_dist", "q68_volume_shipping", "q69_large_volume_cust", "q70_returned_items", "g10_clustering_coef", "x29_ngram_novelty", "e25_burst_detect", "d17_containment", "s22_mutual_knn", "m15_video_neardup", "c05_data_card", "q71_disjunctive_bands", "q72_supplier_parts", "s23_tombstone_ann", "e26_attribution", "q73_shipping_priority", "d18_containment_eval", "q74_local_supplier_volume", "q75_promo_effect", "q76_forecast_revenue", "q77_argmax", "g11_assortativity", "e27_mad_outliers", "e28_stickiness", "s24_range_search", "d19_cluster_profile", "c06_index_lifecycle", "q78_recursive_cte", "s25_range_recall", "e29_time_to_convert", "q79_distribution_ranks", "d20_dedup_dividend", "s26_index_card")
val sb = new StringBuilder
sb.append("# Physical plans (generated at sf0.001, spark-shell local[8])\n\n")
sb.append("Evidence for the scale design: broadcast placement, pushdown, partial aggregation,\nfused top-k, single-shuffle as-of. Regenerate with tools/gen_plans.sh.\n")
for (n <- names) {
  val df = graft.Registry.byName(n).fn(spark, d)
  sb.append(s"\n## $n\n\n```\n")
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(4000))
  sb.append("\n```\n")
}
sb.append("""
## q42_zorder_scan — data-skipping evidence (scan metrics, sf0.1)

Layout: lineitem archived Z-order-clustered on (l_partkey, l_suppkey)
(`Engine.archiveClustered`: Morton interleave -> repartitionByRange ->
sortWithinPartitions, 128 KiB row groups, Parquet bloom filter on
l_orderkey). Control: identical rows, identical row-group size,
insertion order. Identical query answers (oracle-checked); the scans
differ:

| scan (sf0.1, 600,000 rows)                          | rows read |
|------------------------------------------------------|-----------|
| 2-D range predicate, UNSORTED layout                 | 600,000 (100%) |
| 2-D range predicate, Z-ORDERED layout                | 9,825 (1.6%) |
| point probe on l_orderkey (bloom, uncorrelated key)  | 13,100 (2.2%) |

`numOutputRows` on the FileSourceScanExec = rows the Parquet reader
produced after row-group min/max (and bloom) pruning, before any
Spark-side Filter. Each Z-ordered row group covers a small rectangle
of the (partkey, suppkey) space, so footer stats exclude 98% of row
groups for the 2-D predicate; a single-column sort would leave the
second column's min/max spanning the full domain in every group. The
bloom filter prunes the point probe on a column the sort order cannot
help with. Keys are range-normalized to 16-bit codes before the
interleave ((v-min)*65535/span, monotone per column), so the pruning
survives ANY key domain — raw low-bit interleaving would alias values
2^16 apart (ZorderSpec pins a 4M-wide-domain case). The fractions are
scale-free: at 100 TB the same layout skips the same share of ~128 MB
row groups (ZorderSpec pins both effects; measured numbers from that A/B at sf0.1).
""")
Files.createDirectories(Paths.get("/root/repo/docs"))
Files.writeString(Paths.get("/root/repo/docs/PLANS.md"), sb.toString)
println("WROTE_PLANS")
