package graft

import org.scalatest.funsuite.AnyFunSuite

/** join_bloom_runtime's scale story: InjectRuntimeFilter builds a bloom
  * filter from the filtered dim's join keys and applies it to the fact
  * side BEFORE the shuffle — the shuffle-join analogue of dynamic
  * partition pruning. Fact rows whose key can't match never get written
  * to shuffle files; at 100 TB that is most of the scan.
  */
class BloomJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("declared join_bloom_runtime: bloom filter injected on the fact side") {
    val df = q("join_bloom_runtime")
    // optimized plan carries BloomFilterMightContain(bloom_filter_agg(...))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") || opt.contains("BloomFilterMightContain"),
      s"no runtime bloom filter in optimized plan:\n${opt.linesIterator.take(40).mkString("\n")}")
    assert(df.collect().length > 0)
  }

  test("bloom-filtered join returns the same rows as the plain join") {
    import org.apache.spark.sql.functions._
    val plain = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part").where(col("p_size") <= 5),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand").collect()
    val bloomed = q("join_bloom_runtime").select("p_brand", "n").collect()
    assert(plain.map(_.toSeq).toSeq == bloomed.map(_.toSeq).toSeq)
  }
}
