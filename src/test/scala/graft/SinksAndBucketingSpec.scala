package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 cat. A capability rows: csv/json sinks roundtrip, and the
  * bucketed-table write path whose co-located join eliminates the shuffle —
  * the 100 TB fact-fact join strategy (docs/SCALE.md).
  */
class SinksAndBucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("csv and json sinks roundtrip the same relation") {
    val df = Tables.t(spark, sf, "nation")
    val dir = Files.createTempDirectory("graft_sinks_").toFile
    dir.deleteOnExit()
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true").schema(df.schema).csv(s"$dir/csv")
    val fromJson = spark.read.schema(df.schema).json(s"$dir/json")
    assert(fromCsv.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
    assert(fromJson.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("o_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == li.count()) // FK join cardinality preserved
  }

  test("declared join_bucketed_colocated: join keys never shuffle") {
    val df = q("join_bucketed_colocated")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only hash exchange allowed is the downstream aggregate's
    // (o_orderstatus); the bucketed sides must merge without one
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
           !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join keys still shuffle:\n$plan")
  }
}
