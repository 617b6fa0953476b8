package graft

import org.scalatest.funsuite.AnyFunSuite

/** join_skew_aqe's scale story: when the skewed join MUST shuffle (dim too
  * big to broadcast), AQE's OptimizeSkewedJoin detects the hot partition
  * from runtime map-output sizes and splits it across reducers. Thresholds
  * here are scaled down to local data volumes; at 100 TB the defaults
  * (256 MB / factor 5) play the same role.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("OptimizeSkewedJoin splits the hot partition (skew=true in plan)") {
    import org.apache.spark.sql.functions._
    withConfs(Seq(
      // force the shuffle path: a broadcast dim dissolves the skew before
      // it exists (that IS the declared query's plan; here we model the
      // dim outgrowing broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local-scale thresholds: the hot partition (~half of lineitem on
      // one key, ~20KB COMPRESSED map output) is ~10x a median partition
      // but far below the 256MB production default
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "5KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
    )) {
      // Same join shape as the declared join_skew_aqe, with one
      // local-mode accommodation: sf0.001 lineitem is a SINGLE parquet
      // file → one map task, and OptimizeSkewedJoin splits a skewed
      // reduce partition by map-output ranges — one mapper is
      // unsplittable no matter the thresholds. repartition(8) models the
      // many-mapper layout a 100 TB fact always has.
      val li = Tables.t(spark, sf, "lineitem").repartition(8)
        .withColumn("sk",
          when(col("l_orderkey") % 2 === 0, lit(1L)).otherwise(col("l_suppkey")))
      val df = li.join(Tables.t(spark, sf, "supplier"), col("sk") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("sum_price"))
      val rows = df.collect()
      assert(rows.length > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${plan.linesIterator.take(30).mkString("\n")}")
    }
  }

  test("declared plan broadcasts the dim — skew never reaches a shuffle") {
    val df = q("join_skew_aqe")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast dim join:\n${plan.linesIterator.take(30).mkString("\n")}")
  }
}
