package graft

import org.scalatest.funsuite.AnyFunSuite

/** scan_agg_pushdown's whole point is that COUNT/MIN/MAX are answered
  * from parquet footer statistics — assert the V2 scan actually carries
  * the pushed aggregates (and that the values match a plain v1 read), so
  * a conf rename or a Spark behavior change can't silently degrade the
  * query into a full scan that still returns correct numbers.
  */
class AggPushdownScanSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("scan_agg_pushdown plan carries PushedAggregation") {
    val df = SparkEntry.queries("scan_agg_pushdown")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"no PushedAggregation in plan:\n${plan.linesIterator.take(20).mkString("\n")}")
    assert(plan.contains("COUNT(*)") && plan.contains("MIN(l_orderkey)"),
      s"pushed aggregate list incomplete:\n${plan.linesIterator.take(20).mkString("\n")}")
  }

  test("pushed-aggregate answers equal the plain-scan answers") {
    val pushed = SparkEntry.queries("scan_agg_pushdown")(spark, sf).head()
    val plain = {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"),
          min("l_quantity"), max("l_quantity")).head()
    }
    assert(pushed == plain, s"pushed $pushed != plain $plain")
  }

  test("the forked session does not leak V2/pushdown confs to the shared session") {
    SparkEntry.queries("scan_agg_pushdown")(spark, sf).count()
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") != "")
    assert(!spark.conf.getOption("spark.sql.parquet.aggregatePushdown").contains("true"))
  }
}
