package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-shape regression guard: the zero-exchange / broadcast / reuse
  * properties individual specs assert are per-operator — this suite
  * sweeps the gate's top-cost query plans for the global anti-patterns
  * that creep in silently on refactors:
  *   - CartesianProduct (an unconditioned join of two big sides);
  *   - BroadcastNestedLoopJoin whose build side is NOT a provably tiny
  *     frame (a single-row no-grouping aggregate or ≤1-row local scan) —
  *     the gated 1-row bound frames the operators deliberately use stay
  *     allowed;
  *   - duplicate UNREUSED shuffle exchanges over the same canonical
  *     subtree in the post-execution adaptive plan (the shared-scan
  *     rewrites depend on runtime exchange reuse; losing it doubles the
  *     heaviest scans).
  * Audits run POST-execution at sf0.001 so AQE's final shape — the one
  * production gets — is what is checked.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Top-cost + representative BATCH gate queries. Streaming and
    * file-roundtrip queries execute side effects at build time and have
    * their plans audited in their own specs.
    */
  private val audited = Seq(
    "q01_pricing_summary", "q04_top_customers", "q09_cte_distribution",
    "q12_case_when", "q16_rollup", "q24_dedup_exact", "q26_jaccard_pairs",
    "q27_minhash_lsh", "q28_simhash_pairs", "q29_ann_topk",
    "q40_lsh_cosine_pairs", "q45_asof_join", "q46_range_join",
    "q47_sessionize", "q51_neardup_clusters", "q55_decontamination",
    "q63_minhash_capped", "q64_embedding_neardup_clusters",
    "q68_tfidf_terms", "q70_delta_neardup", "q76_bloom_join",
    "q77_heavy_hitters", "q78_unigram_lm", "q85_corpus_card",
    "q88_c4_line_filter", "q89_gopher_rules", "q90_token_chunks",
    "q91_countmin_sketch", "q93_temperature_mix", "q94_profile_merge",
    "q95_salted_join", "q96_packed_text", "q97_vocab_encode",
    "q99_span_dedup", "q103_normalized_dedup", "q104_dsir_select",
    "q107_span_decontaminate", "q108_html_extract", "q111_robots_filter",
    "q113_fuzzy_decontamination", "q114_sessionize",
    "q117_url_canonicalize", "q119_neardup_keep_best",
    "q121_active_users", "q122_token_budget_sample",
    // round-7 widening: the previously unaudited batch families —
    // similarity/selection side-table builders run their writes at
    // sf0.001 (reaped per run), which is exactly how Verify drives them
    "q31_cosine_neardup", "q52_hash_split", "q56_repetition_ratio",
    "q57_pii_redaction", "q58_kmeans_ivf", "q65_line_dedup",
    "q66_nfc_normalize", "q67_domain_cap", "q69_stratified_sample",
    "q71_pack_sequences", "q79_quantize_int8", "q80_multimodal_features",
    "q82_histogram", "q83_profile", "q92_ivf_nprobe", "q98_semantic_dedup",
    "q105_quality_classifier", "q106_pq_adc", "q109_host_pagerank",
    "q115_funnel", "q116_cohort_retention", "q118_epoch_mix",
    "q123_cluster_safe_split",
    // round-7 curation additions (q124 targeted delete is a file
    // side-effect query — audited in DeleteSpec instead)
    "q125_corpus_overlap", "q126_perplexity_buckets",
    "q127_priority_sample", "q128_pii_profile", "q129_bigram_lm",
    "q132_point_in_time_join", "q134_schema_contract",
    "q135_bloom_decontamination", "q136_funnel_within",
    "q138_active_users_sketch", "q139_priority_sample_per_group",
    "q141_span_corruption",
    // round-7 analytics widening (q147's bucket-pruned index plan is
    // asserted in SearchIndexSpec — it is a catalog side-effect query)
    "q142_bm25_topk", "q143_attribution", "q144_ewma_anomaly",
    "q145_event_pivot", "q146_transition_matrix", "q148_k_anonymity",
    "q149_embedding_outliers", "q150_freshness", "q151_ann_recall",
    "q152_hard_negatives", "q153_word_dropout", "q154_temporal_split",
    "q155_stable_ids", "q156_peak_concurrency", "q157_lang_confusion",
    "q158_scd1_upsert", "q159_l_diversity", "q160_rolling_retention",
    "q161_activity_histogram", "q163_pmi_pairs", "q164_token_entropy",
    "q165_equidepth_bins", "q166_correlation_matrix",
    "q167_funnel_latency", "q168_top_paths", "q169_cohort_value",
    "q170_rfm_segments", "q171_trending_terms", "q172_covisitation",
    "q173_cross_correlation", "q174_key_skew", "q175_fuzzy_entity_dedup",
    "q176_weekday_anomaly", "q177_referential_integrity",
    // round-8 widening (q178/q181 are catalog side-effect queries —
    // their plans are asserted in NearDupIndexSpec/FingerprintIndexSpec;
    // q183 is a streaming query, its lane is spec-audited)
    "q179_pq_recall", "q180_image_meta", "q182_record_linkage",
    "q184_semantic_decontamination", "q185_cooc_pmi", "q186_psi_drift",
    "q188_psi_categorical", "q189_ks_drift", "q191_hybrid_rrf",
    "q192_heavy_hitters_per_group", "q193_truncated_dim_recall",
    "q194_media_meta", "q195_balanced_downsample", "q196_embedding_drift",
    "q197_psi_by_group", "q201_token_dedup_pairs", "q205_ks_by_group",
    // round-10 batch additions: q211's fold-in runs the audited CC
    // machinery over labels-as-star-edges; q212 executes its layout
    // write + manifest at build time (the side-table convention) and
    // audits the PRUNED scan's aggregate; q213 is the banded simhash
    // pairing over aHash fingerprints (q28's audited join shape)
    "q211_incremental_clusters", "q212_pruned_scan", "q213_media_neardup",
    // round-11 batch additions: q214/q215 execute their layout writes +
    // multi-pass periods at build time (the q212 side-effect
    // convention) and audit the final pruned-scan aggregates; q218 is
    // the planted-PNG pixel-hash projection (UDF encode + codegen'd
    // AHash64 — no join, no shuffle beyond the sort). q216/q217/q219
    // are streaming (the q206 family) — replay/partials invariants
    // live in StreamsSpec.
    "q214_yaml_pruned_incremental", "q215_inlist_pruned_scan",
    "q218_pixel_ahash",
    // round-12 batch additions: q220 runs its producer/consumer
    // MultiPass DAG at build time (q214's side-effect convention) and
    // audits the final inc_* aggregate; q221 executes its zorder write
    // + write-time manifest and audits the two-dim pruned-scan
    // aggregate. q222/q223 are streaming (the q101/q204 families) —
    // their replay/coverage invariants live in StreamsSpec /
    // RunnerEndToEndSpec.
    "q220_selfmaintaining_skip_dag", "q221_zorder_twodim_prune",
    // q225 executes its bloom-enabled layout write at build time and
    // audits the bloom-pruned scan's aggregate
    "q225_bloom_pruned_probe")
    // round-9: q198/q199/q200 are catalog/path side-effect queries
    // (the q147/q190 family) — their plan shapes (bucket pruning,
    // partition pruning, zero-rewrite vacuums, reference-free monitor
    // ticks) are asserted in SearchIndexSpec / PqSpec /
    // AnalyticsOpsSpec. q201 writes its merge side table (q100's
    // shape) but its pairing plan is the audited q26 inverted-index
    // join at token grain — audit it.
    // round-10: q206 is streaming (the q204 family); q207/q208 write
    // their reference profiles at build time (the q200/q202 family) —
    // the poisoned-source + partials-order invariants live in
    // StatsAnalyticsSpec/StreamsSpec. q186's exact path returns a
    // LOCAL grid (zero corpus scans, pinned in StatsAnalyticsSpec) —
    // it stays in the audit and is trivially clean.

  /** Queries whose BroadcastNestedLoopJoin is RUNTIME-gated rather than
    * plan-visible: brute-force cosine top-k broadcasts the probe side
    * behind `Similarity.gateProbes` (a require() on the probe row count,
    * spec-covered in SimilarityIndexSpec), and `deltaNearDupPairs`
    * broadcasts the delta side only below `maxBroadcastDelta` rows
    * (above it the plan routes through LSH buckets) — the non-equi
    * scoring joins are the documented design, not regressions.
    */
  private val runtimeGatedBnlj =
    Set("q29_ann_topk", "q31_cosine_neardup", "q151_ann_recall",
      // q179's exact ground-truth leg is q151's gated bruteForceTopK
      "q179_pq_recall",
      // q184's eval side broadcasts below maxBroadcastEval (the
      // deltaNearDupPairs gate) — the non-equi scoring join is the design
      "q184_semantic_decontamination",
      // q191's exact-cosine leg is the gated bruteForceTopK (q29's design)
      "q191_hybrid_rrf",
      // q193 runs TWO gated brute-force legs (full-dim truth + truncated)
      "q193_truncated_dim_recall")

  /** Anti-pattern findings — the shared [[PlanAudit]] sweep with this
    * roster's runtime-gated-BNLJ allowlist applied.
    */
  private def violations(name: String, df: DataFrame): Seq[String] =
    PlanAudit.violations(name, df, allowGatedBnlj = runtimeGatedBnlj(name))

  test("top-cost gate queries carry none of the named anti-patterns") {
    val found = audited.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      // collect() drives THIS DataFrame's own QueryExecution, so its
      // AdaptiveSparkPlanExec mutates to the final reuse-resolved plan
      // (count() would execute a derived plan and leave this one initial)
      df.collect()
      violations(name, df)
    }
    assert(found.isEmpty, s"plan anti-patterns:\n${found.mkString("\n")}")
  }

  test("the audit actually fires on seeded anti-patterns") {
    import spark.implicits._
    val left = (1L to 200L).map(i => (i, i % 7)).toDF("a", "ga")
    val right = (1L to 200L).map(i => (i, i % 5)).toDF("b", "gb")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = left.crossJoin(right)
      cart.collect()
      assert(violations("seed", cart).exists(_.contains("CartesianProduct")))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // non-equi join with a multi-row broadcast side → ungated BNLJ
    val bnlj = left.join(broadcast(right), col("a") < col("b"))
    bnlj.collect()
    assert(violations("seed", bnlj)
      .exists(_.contains("ungated BroadcastNestedLoopJoin")))
    // the deliberate 1-row bound frame shape stays allowed
    val gated = left.crossJoin(broadcast(right.agg(count(lit(1)).as("n"))))
    gated.collect()
    assert(violations("seed", gated).isEmpty)
    // identical twin aggregates: reused by default, flagged when reuse is off
    val agg = left.groupBy("ga").agg(sum("a").as("s"))
    val reusedTwin = agg.unionByName(agg)
    reusedTwin.collect()
    assert(violations("seed", reusedTwin).isEmpty,
      "runtime-reused twin exchanges must not be flagged")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val twin = agg.unionByName(agg)
      twin.collect()
      assert(violations("seed", twin).exists(_.contains("duplicate exchanges")))
    } finally spark.conf.unset("spark.sql.exchange.reuse")
  }
}
