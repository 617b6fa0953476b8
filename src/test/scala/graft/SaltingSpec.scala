package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting rewrites must be result-equivalent to their unsalted plans. */
class SaltingSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on a skewed key") {
    // skew: every lineitem of a hot order region keyed to one value
    val li = Tables.t(spark, sf, "lineitem")
      .withColumn("skew_key", when(col("l_orderkey") % 10 < 8, 0L).otherwise(col("l_orderkey")))
    val dim = li.select(col("skew_key")).distinct()
      .withColumn("dim_tag", concat(lit("k"), col("skew_key")))
    val plain = li.join(dim, "skew_key")
      .groupBy("dim_tag").agg(count(lit(1)).as("n"))
    val salted = ops.Salting.saltedJoin(li, dim, "skew_key")
      .groupBy("dim_tag").agg(count(lit(1)).as("n"))
    assert(salted.orderBy("dim_tag").collect().toSeq ==
      plain.orderBy("dim_tag").collect().toSeq)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val e = Tables.events(spark, sf)
    val direct = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val salted = ops.Salting.saltedCountSum(e, "event_type", "value")
    val j = direct.withColumnRenamed("n", "n0").withColumnRenamed("sum_value", "s0")
      .join(salted, "event_type")
    assert(j.where(col("n0") =!= col("n")).count() == 0)
    // double sums may differ in low bits across fold orders — compare rounded
    assert(j.where(round(col("s0"), 6) =!= round(col("sum_value"), 6)).count() == 0)
  }
}
