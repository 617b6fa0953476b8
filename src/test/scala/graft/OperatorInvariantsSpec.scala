package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator invariants (SURVEY.md §5.4): join cardinality bounds,
  * agg-vs-window consistency, set-op algebra, dedup idempotence,
  * similarity sanity, inference-path agreement.
  */
class OperatorInvariantsSpec extends AnyFunSuite {
  import TestSpark._

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("contract: every oracle key has a query; every query is declared once") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle keys without queries: ${ok -- qk}")
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
  }

  test("join_range_binned avoids the nested-loop plan (bins → equi join)") {
    val plan = q("join_range_binned").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), "interval join fell back to BNLJ")
  }

  test("dedup verify merges 64-bit token codes, not strings (round 13)") {
    // The set-pair verify is the board's densest all-core compute stage;
    // round 13 moved its intersect from array<string> to sorted xxhash64
    // codes (8 fixed bytes/element through the candidate join) behind a
    // loud per-corpus injectivity check. Pin the plan shape so a refactor
    // can't silently regress the verify back to string traffic.
    val plan = q("dedup_allpairs_exact").queryExecution.analyzed.toString
    assert(plan.contains("sorted_intersect_count(th_sa"),
      "verify no longer merges the coded th_* arrays")
    assert(!plan.contains("sorted_intersect_count(ts"),
      "verify regressed to string-array intersection")
  }

  test("join cardinality: semi + anti partition the left table") {
    val customers = Tables.t(spark, sf, "customer").count()
    assert(q("join_semi").count() + q("join_anti").count() == customers)
  }

  test("join cardinality: inner <= cross upper bound") {
    val r = Tables.t(spark, sf, "region").count()
    val n = Tables.t(spark, sf, "nation").count()
    assert(q("join_cross").count() == r * n)
    val li = Tables.t(spark, sf, "lineitem").count()
    assert(q("join_inner_broadcast").count() == li) // FK join: 1 part per item
    assert(q("join_theta_range").count() <= li)     // extra range predicate
  }

  test("outer joins preserve unmatched sides") {
    val parts = Tables.t(spark, sf, "part").count()
    assert(q("join_right").count() >= parts)
    val su = Tables.t(spark, sf, "supplier")
    val cu = Tables.t(spark, sf, "customer")
    assert(q("join_full").count() >=
      math.max(su.count(), cu.count()))
  }

  test("agg vs window: per-customer total equals final running sum") {
    val agg = Tables.t(spark, sf, "orders").groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(30,2)")).cast("double").as("total"))
    val win = q("win_running_sum")
      .groupBy("o_custkey").agg(max("running_total").as("total"))
    assert(agg.join(win, "o_custkey")
      .where(agg("total") =!= win("total")).count() == 0)
  }

  test("set algebra: |union_all| = |A| + |B|; intersect/except partition A") {
    val a = Tables.t(spark, sf, "customer").select(col("c_nationkey")).distinct().count()
    assert(q("set_intersect").count() + q("set_except").count() == a)
    val allRows = Tables.t(spark, sf, "customer").count() +
      Tables.t(spark, sf, "supplier").count()
    assert(q("set_union_all").count() == allRows)
    assert(q("set_union_distinct").count() <= allRows)
  }

  test("bag semantics: intersectAll + exceptAll re-partition the customer bag") {
    val bag = q("set_intersect_all")
    val customers = Tables.t(spark, sf, "customer").count()
    assert(bag.count() == customers) // |A ∩all B| + |A ∖all B| = |A|
  }

  test("dedup idempotence: exact-dedup groups cover all docs exactly once") {
    val groups = q("dedup_exact")
    val docs = Tables.t(spark, sf, "documents").count()
    assert(groups.agg(sum("n_copies")).head.getLong(0) == docs)
    assert(groups.where(col("n_copies") < 1).count() == 0)
  }

  test("near-dup pairs are symmetric-free and within Jaccard bounds") {
    val pairs = q("dedup_near_shingle")
    assert(pairs.where(col("d1") >= col("d2")).count() == 0)
    assert(pairs.where(col("jaccard") < 0.9 || col("jaccard") > 1.0).count() == 0)
  }

  test("cosine top-k: ranks dense 1..k, cosine in [-1,1], non-increasing") {
    val tk = q("sim_cosine_topk")
    assert(tk.where(col("cosine") < -1.0 || col("cosine") > 1.0).count() == 0)
    val perProbe = tk.groupBy("p_id").agg(count(lit(1)).as("n"),
      min("rnk").as("lo"), max("rnk").as("hi"))
    assert(perProbe.where(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() == 0)
    // non-increasing cosine with rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("p_id").orderBy("rnk")
    assert(tk.withColumn("prev", lag("cosine", 1).over(w))
      .where(col("prev").isNotNull && col("cosine") > col("prev")).count() == 0)
  }

  test("inference: mapPartitions path agrees with SQL-shaped path") {
    val a = q("infer_argmax").select("vec_id", "pred")
    val b = q("infer_mapp_argmax").select(col("vec_id"), col("pred").as("pred2"))
    assert(a.join(b, "vec_id").where(col("pred") =!= col("pred2")).count() == 0)
  }

  test("inference: confusion matrix totals equal corpus; accuracy consistent") {
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(q("eval_confusion").agg(sum("n")).head.getLong(0) == n)
    val acc = q("eval_accuracy").head
    assert(acc.getAs[Long]("n") == n)
    val diag = q("eval_confusion").where(col("label") === col("pred"))
      .agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
    assert(acc.getAs[Long]("n_correct") == diag)
  }

  test("window topk: every group has at most 3 rows, ranks start at 1") {
    val tk = q("win_topk_per_group")
    val g = tk.groupBy("p_brand").agg(count(lit(1)).as("n"), min("rn").as("lo"))
    assert(g.where(col("n") > 3 || col("lo") =!= 1).count() == 0)
  }

  test("determinism: running a query twice yields identical collected output") {
    for (name <- Seq("agg_groupby", "join_multiway_star", "sim_cosine_topk", "fn_math")) {
      val a = q(name).collect().toSeq
      val b = q(name).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }

  test("pack_sequences: per-shard packing is gapless, contiguous, and complete") {
    val p = q("pack_sequences").cache()
    // every document is packed exactly once
    assert(p.count() == Tables.t(spark, sf, "documents").count())
    // each shard's stream starts at offset 0 (no leading gap)
    assert(p.groupBy("shard").agg(min("tok_start").as("lo"))
      .where(col("lo") =!= 0L).count() == 0)
    // contiguity: the shard's token total equals its last doc's end offset
    val ends = p.groupBy("shard").agg(
      sum("n_tokens").as("total"), max(col("tok_start") + col("n_tokens")).as("hi"))
    assert(ends.where(col("total") =!= col("hi")).count() == 0)
    // sequence span arithmetic holds row by row
    assert(p.where(col("n_seqs") < 1 ||
      col("n_seqs") =!= col("seq_last") - col("seq_first") + 1).count() == 0)
    p.unpersist()
  }

  test("text_repetition: ratios bounded, distinct tokens imply zero dup ratio") {
    val r = q("text_repetition").cache()
    assert(r.where(col("dup_token_ratio") < 0 || col("dup_token_ratio") > 1 ||
      col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).count() == 0)
    // a doc whose tokens are all distinct must report dup_token_ratio = 0
    assert(r.where(col("dup_token_ratio") === 0.0)
      .join(Tables.t(spark, sf, "documents"), "doc_id")
      .where(size(array_distinct(split(col("text"), " "))) =!= col("n_tokens"))
      .count() == 0)
    r.unpersist()
  }

  test("sample_stratified: at most 5 per stratum, dense ranks, sample ⊆ corpus") {
    val smp = q("sample_stratified").cache()
    val g = smp.groupBy("lang").agg(count(lit(1)).as("n"),
      min("rk").as("lo"), max("rk").as("hi"))
    assert(g.where(col("n") > 5 || col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    assert(smp.join(Tables.t(spark, sf, "documents"), Seq("doc_id"), "left_anti")
      .count() == 0)
    smp.unpersist()
  }

  test("stream_static_join: enrichment preserves stream cardinality and keys") {
    val e = q("stream_static_join")
    val events = Tables.events(spark, sf)
    assert(e.count() == events.count()) // every user_id has a customer row
    assert(e.groupBy("event_id").count().where(col("count") > 1).count() == 0)
  }
}
