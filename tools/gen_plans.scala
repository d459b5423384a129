import java.nio.file.{Files, Paths}
val d = "/root/testdata/sf0.001"
val names = Seq("q01_agg", "q03_join_broadcast", "q07_join_nonequi", "q16_topk", "q22_asof_join", "d02_minhash_lsh", "d03_ngram_jaccard", "d05_embedding_neardup", "s02_ann_lsh", "e03_session_window", "q32_topk_per_key", "x05_train_test_split", "x07_contamination", "q34_topk_strategy", "s04_ivf_ann", "q33_bloom_prefilter", "q35_custom_hll", "q36_custom_quantile", "d08_dfcap_jaccard", "q38_kll_quantile", "q39_outer_join", "q40_unpivot", "x10_pii_redact", "e07_interval_join", "m04_arrow_batch", "q41_latest_per_key", "x11_oov_rate", "e08_gapfill", "x12_sequence_pack", "s05_ivf_index_probe")
val sb = new StringBuilder
sb.append("# Physical plans (generated at sf0.001, spark-shell local[8])\n\n")
sb.append("Evidence for the scale design: broadcast placement, pushdown, partial aggregation,\nfused top-k, single-shuffle as-of. Regenerate with tools/gen_plans.sh.\n")
for (n <- names) {
  val df = graft.Registry.byName(n).fn(spark, d)
  sb.append(s"\n## $n\n\n```\n")
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(4000))
  sb.append("\n```\n")
}
Files.createDirectories(Paths.get("/root/repo/docs"))
Files.writeString(Paths.get("/root/repo/docs/PLANS.md"), sb.toString)
println("WROTE_PLANS")
