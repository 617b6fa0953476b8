package graft

import org.apache.spark.sql.SparkSession

/** Shuffle-budget auditor: prints `name<TAB>n_shuffle_exchanges` for every
  * declared query, using the same session shape as the test suite
  * (local[8], 8 shuffle partitions, graft extensions, UTC).
  *
  * The output is the source of truth for
  * `src/test/resources/shuffle_budget.tsv`, which PlanGuardSpec enforces:
  * a refactor that adds a shuffle to any query's plan fails the suite
  * until the budget is consciously regenerated. Shuffle exchanges — not
  * broadcasts — are counted, because the shuffle count is the thing that
  * decides whether a plan survives a 100× scale-up.
  *
  * Regenerate with:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001" \
  *     > src/test/resources/shuffle_budget.tsv
  */
object PlanAudit {
  /** Count shuffle exchanges (hash / range / single-partition), excluding
    * BroadcastExchange, in an executed-plan string.
    */
  def shuffleCount(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.specs.sortBy(_.name).foreach { sp =>
      // visible shuffles in the final plan + shuffles hidden behind any
      // ScalableCumulate.materialize checkpoint built during construction
      // (round-9 advice: the checkpoint must not create a budget blind
      // spot) — PlanGuardSpec reproduces this exact recipe.
      ops.ScalableCumulate.resetHiddenShuffles()
      val plan = sp.fn(spark, sfDir).queryExecution.executedPlan.toString
      println(s"${sp.name}\t${shuffleCount(plan) + ops.ScalableCumulate.hiddenShuffles}")
    }
    ops.ScalableCumulate.endAudit()
    spark.stop()
  }
}
