package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression tripwire (round-4 verdict #5): asserts, for EVERY
  * declared query, the physical-plan invariants the 100 TB story depends
  * on. A future Spark upgrade, conf change, or refactor that silently
  * degrades a plan — a join falling back to a cartesian product, a
  * nested-loop join appearing where a hash join was intended, DPP or the
  * runtime bloom filter no longer firing, an exchange sneaking above a
  * bucketed scan — fails here with the query name in the test title,
  * before it ever reaches a bench regression.
  *
  * The allowlists are EXPLICIT and justified inline; anything new that
  * plans a cartesian/BNLJ must either fix its plan or argue its way into
  * the list.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  /** Queries allowed to plan CartesianProduct: only the declared cross
    * join (5×25 rows by construction).
    */
  private val cartesianAllow = Set("join_cross")

  /** Queries allowed to plan BroadcastNestedLoopJoin — each is either a
    * deliberate cross/theta shape or a broadcast of a BOUNDED side:
    *  - join_cross: the declared cartesian (tiny dims; broadcast variant)
    *  - join_theta_range: pure non-equi predicate — no equi key exists,
    *    BNLJ over a broadcast bounded side IS the plan (the binned/auto
    *    range joins are the scale path)
    *  - join_q15_toprevenue / join_q22_idle_rich / text_tfidf_topk /
    *    evt_rfm / sample_temperature / graph_triangle_count /
    *    eval_kappa_mcc:
    *    1-row global-scalar subquery broadcast back onto the relation —
    *    the standard decorrelation (graph_triangle_count and
    *    eval_kappa_mcc cross three 1-row aggregates into their single
    *    summary rows)
    *  - sim_* / dedup_embed_cosine / sim_knn_classify / eval_mrr /
    *    eval_ndcg: fixed probe set (vec_id predicate) broadcast against
    *    the corpus with a non-equi self-exclusion — scan ∥ broadcast ∥
    *    fold, zero shuffle (the eval_* pair rank the same cosine relation)
    *  - text_cross_entropy: 1-row corpus-total aggregate broadcast back
    *    onto the per-doc relation (the text_tfidf_topk decorrelation)
    */
  private val bnljAllow = Set(
    "join_cross", "join_theta_range",
    "join_q15_toprevenue", "join_q22_idle_rich", "text_tfidf_topk",
    "evt_rfm", "sample_temperature", "graph_triangle_count",
    "eval_kappa_mcc",
    "sim_cosine_topk", "sim_cosine_fused", "sim_dot_native",
    "sim_knn_classify", "dedup_embed_cosine",
    "eval_mrr", "eval_ndcg", "text_cross_entropy",
    "sim_quantized_recall", "dedup_containment")

  for (spec <- SparkEntry.specs) {
    test(s"plan guard: ${spec.name}") {
      val plan = spec.fn(spark, sf).queryExecution.executedPlan.toString
      if (!cartesianAllow(spec.name))
        assert(!plan.contains("CartesianProduct"),
          s"${spec.name} plans a CartesianProduct:\n${plan.linesIterator.take(30).mkString("\n")}")
      if (!bnljAllow(spec.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${spec.name} plans a BroadcastNestedLoopJoin:\n${plan.linesIterator.take(30).mkString("\n")}")
    }
  }

  test("plan guard: scan_dpp keeps its DynamicPruningExpression") {
    val plan = q("scan_dpp").queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "scan_dpp lost dynamic partition pruning")
  }

  test("plan guard: join_bloom_runtime keeps its runtime bloom filter") {
    val opt = q("join_bloom_runtime").queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") || opt.contains("BloomFilterMightContain"),
      "join_bloom_runtime lost its injected bloom filter")
  }

  test("bench guard: the SLOW allowlist names only declared queries") {
    // keeps Bench.slowAllow honest: a renamed/removed query can't linger
    // in the allowlist, and the documented budget set stays auditable here
    val declared = SparkEntry.queries.keySet
    val stale = Bench.slowAllow -- declared
    assert(stale.isEmpty, s"SLOW allowlist entries not declared: $stale")
  }

  test("plan guard: memoized dedup consumers actually reuse the pair relation") {
    // round-7 verdict #4: a refactor that silently bypasses minhashSetPairs
    // would only surface as a bench regression — assert the plan shape
    // instead. The memo is a localCheckpointed relation, so a consumer
    // that reuses it scans an ExistingRDD; one that REBUILDS would plan
    // the banded-minhash candidate join, whose xxhash64(band, token)
    // signature appears nowhere else in these queries' plans.
    ops.LlmOps.minhashSetPairs(spark, sf).count() // ensure the memo exists
    for (name <- Seq("dedup_canonical", "graph_degree_dist",
        "graph_triangle_count", "dedup_cc_labelprop")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Scan ExistingRDD"),
        s"$name does not scan the localCheckpointed memo relation")
      assert(!plan.contains("xxhash64"),
        s"$name plans the banded-minhash candidate join — memo bypassed")
    }
  }

  test("plan guard: join_bucketed_colocated joins without re-shuffling either side") {
    val plan = q("join_bucketed_colocated").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "bucketed join no longer sort-merge")
    // bucketing must satisfy the join's distribution: the ONLY hash
    // exchange permitted is the one ABOVE the join for the groupBy —
    // neither join key may be re-partitioned
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side re-shuffled despite bucketing")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side re-shuffled despite bucketing")
  }
}
