package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the `spark.sql.extensions=graft.GraftExtensions` seam
  * (TestSpark sets it) must install the as-of planner strategy and the
  * dot_product SQL function WITHOUT any imperative registration call.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("dot_product resolves from SQL via injectFunction alone") {
    // no DotProductExpr.register(spark) here — only the extension installs it
    val r = spark.sql(
      """SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d"""
        .stripMargin).head
    assert(r.getDouble(0) == 4.0)
  }

  test("as-of join plans through the injected strategy, not extraStrategies") {
    val native = q("join_asof_native")
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin") || plan.contains("BroadcastAsOfJoin"))
    // ensureRegistered must have recognized the injected strategy and NOT
    // fallen back to the imperative experimental seam
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    assert(!s.experimental.extraStrategies.exists(
      _.isInstanceOf[graft.plans.AsOfJoinStrategy]))
  }
}
