package graft

import org.scalatest.funsuite.AnyFunSuite

/** sql_join_hints exists to prove the strategy escape hatch works —
  * assert the hint actually flips the physical join, in both directions,
  * so a Spark upgrade that starts ignoring the hint text fails loudly.
  */
class JoinHintSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def plan(hint: String): String = {
    Tables.registerAll(spark, sf)
    spark.sql(
      s"""SELECT $hint n_name, count(*) AS n
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name""").queryExecution.executedPlan.toString
  }

  test("MERGE hint forces a sort-merge join where stats would broadcast") {
    val p = plan("/*+ MERGE(supplier) */")
    assert(p.contains("SortMergeJoin"), s"no SortMergeJoin:\n$p")
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("BROADCAST hint (and the default) plan a broadcast-hash join") {
    val p = plan("/*+ BROADCAST(nation) */")
    assert(p.contains("BroadcastHashJoin"), s"no BroadcastHashJoin:\n$p")
    val d = plan("")
    assert(d.contains("BroadcastHashJoin"), s"default not broadcast:\n$d")
  }

  test("declared sql_join_hints query plans the hinted sort-merge join") {
    val p = SparkEntry.queries("sql_join_hints")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"hint lost in declared query:\n$p")
  }
}
