package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain(formatted)` for selected declared queries
  * so scan pruning (ReadSchema), predicate pushdown (PushedFilters), join
  * strategies, and WholeStageCodegen spans can be inspected. Run:
  *   sbt "runMain graft.Plans [query ...]"
  */
object Plans {
  val defaults = Seq(
    "scan_prune", "scan_pushdown", "join_inner_broadcast", "join_inner_shuffle",
    "join_multiway_star", "agg_groupby", "win_running_sum", "topk_global",
    "sim_cosine_topk", "infer_score", "text_tokenize",
    "join_asof_native", "join_range_binned", "join_q3_shipping",
    "agg_kll_quantiles", "agg_heavy_hitters", "win_rank_scalable",
    "join_range_auto", "join_q18_bigorders", "sim_cosine_fused",
    "evt_funnel", "evt_cohort_retention", "text_chunk",
    "join_q21_blame", "join_lateral_topk", "sql_recursive_cte",
    "agg_typed_weighted", "dedup_editdist", "pipeline_e2e",
    "scan_dpp", "join_skew_aqe", "join_q15_toprevenue", "join_q22_idle_rich",
    "join_bucketed_colocated",
    "join_q4_priority", "join_q14_promo", "mm_decode_real",
    "dedup_minhash_full", "dedup_allpairs_exact", "dedup_canonical",
    "dedup_cc_labelprop",
    "join_q5_local_supplier", "agg_q6_forecast", "join_q8_market_share",
    "join_q9_profit", "text_repetition", "pack_sequences",
    "sample_stratified", "text_pii_scrub", "sample_hash",
    "text_decontaminate", "stream_static_join", "evt_wau_rolling")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else defaults
    val d = "/root/testdata/sf0.01"
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
