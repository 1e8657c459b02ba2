package graft

/** The driver smoke-checks SparkEntry.entry for rows > 0 at sf0.001 —
  * assert exactly that contract here so a regression fails fast. */
class EntrySpec extends SparkSpec {
  test("entry: flagship grouping-set query returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set(
      "period", "yr", "state", "biome", "value", "g_period", "g_state", "g_biome"))
  }

  test("every declared query has either an oracle or is known rows-only") {
    val rowsOnly = Set("q36_minhash_pairs", "q37_simhash", "q40_ann_lsh",
      "q50_multimodal_features", "q55_winnow_fp", "q56_ivf_topk",
      "q61_lsh_near_dup", "q65_simhash_pairs", "q73_winnow_pairs",
      "q85_semdedup", "q95_dedup_corpus", "q97_dedup_incremental",
      "q101_sq8_topk", "q106_diversity_sample", "q109_quality_classifier",
      "q110_bpe_merges", "q116_pq_topk", "q118_curate_neardup",
      "q119_ivfpq_topk", "q120_bpe_encode", "q122_opq_topk",
      "q125_cms_hitters", "q129_cardinality_audit", "q130_cms_incremental",
      "q134_knn_join", "q135_cross_near_dups", "q140_knn_join_sq8",
      "q143_vocab_incremental", "q145_length_sketch",
      "q146_source_overlap_sketch", "q147_hitters_sketch", "q151_text_ann",
      "q152_knn_join_pq", "q154_knn_join_opq", "q159_knn_join_bin")
    val declared = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(declared), s"orphan oracles: ${oracled -- declared}")
    assert((declared -- oracled) == rowsOnly,
      s"unexpected rows-only set: ${declared -- oracled}")
  }
}
