package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 connector (graft.sources.SynthSource): parallel split planning,
  * column pruning reaching the reader, filter pushdown consuming event_id
  * ranges at planning time (split skipping), and generator determinism.
  */
class SynthSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def read(rows: Long = 10000, parts: Int = 8): DataFrame =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows).option("numPartitions", parts).option("seed", 42)
      .load()

  test("reads the declared row count across the declared splits") {
    val df = read()
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.schema.fieldNames.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
  }

  test("deterministic: same seed twice -> identical content") {
    val h = (d: DataFrame) => d.agg(sum(hash(col("event_id"), col("user_id"),
      col("event_type"), col("value")))).head.getLong(0)
    assert(h(read()) == h(read()))
  }

  test("column pruning reaches the reader (scan output shows pruned attrs)") {
    val df = read().select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output attribute list
    assert(plan.contains("BatchScan graft_synth_events[event_id#"), plan)
    assert(!plan.contains("user_id"), plan)
    assert(df.agg(sum("event_id")).head.getLong(0) == 10000L * 9999 / 2)
  }

  test("event_id range pushdown prunes splits at planning time") {
    // ids [0,1250) live entirely in split 0 of 8
    val df = read().where(col("event_id") < 1250L)
    assert(df.rdd.getNumPartitions == 1, "range filter should skip 7 of 8 splits")
    assert(df.count() == 1250)
    val plan = df.queryExecution.executedPlan.toString
    // the scan's description reflects the consumed range bound
    assert(plan.contains("range=[0,1250)"), plan)
    // a non-range filter stays post-scan and still evaluates correctly
    val mixed = read().where(col("event_id") >= 8750L && col("user_id") < 500L)
    assert(mixed.rdd.getNumPartitions == 1)
    val expect = (8750L until 10000L).count(id => graft.sources.SynthSource.userId(42, id) < 500)
    assert(mixed.count() == expect)
  }

  test("limit pushdown truncates the planned range (no full-scan LIMIT)") {
    val df = read().limit(100)
    assert(df.count() == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,100)"), plan)
    // limit composes with a pushed lower bound
    val shifted = read().where(col("event_id") >= 5000L).limit(10)
    assert(shifted.count() == 10)
    assert(shifted.queryExecution.executedPlan.toString.contains("range=[5000,5010)"))
  }

  test("reported statistics let Catalyst broadcast a pruned synth side") {
    val small = read(rows = 50, parts = 2)
    val li = Tables.t(spark, sf, "lineitem").limit(1000)
    val joined = li.join(small, li("l_orderkey") === small("event_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("pushdown saturates at Long boundaries instead of wrapping") {
    assert(read().where(col("event_id") > Long.MaxValue).count() == 0)
    assert(read().where(col("event_id") <= Long.MaxValue).count() == 10000)
  }

  test("scan feeds the vectorized pipeline (ColumnarToRow boundary)") {
    val df = read(rows = 20000, parts = 4)
      .where(col("event_type") === "click").groupBy("user_id").count()
    assert(df.collect().nonEmpty) // materialize THIS plan (AQE finalizes it)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar read path not active:\n${plan.linesIterator.take(12).mkString("\n")}")
    // pruned-to-zero-columns batches (pure count) also go columnar
    assert(read(rows = 12345, parts = 3).count() == 12345)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered in closed form, zero rows generated") {
    val df = read(rows = 100000, parts = 8)
      .where(col("event_id") >= 100L && col("event_id") < 5000L)
      .agg(count(lit(1)).as("n"), min("event_id").as("mn"),
        max("event_id").as("mx"), countDistinct("event_id").as("nd"))
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4900L, 100L, 4999L, 4900L))
    // the physical scan is the one-row pre-aggregated scan, not a generator
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-PUSHED"),
      s"aggregate not pushed:\n${plan.linesIterator.take(12).mkString("\n")}")
  }

  test("aggregate pushdown declines when the closed form would be wrong") {
    // residual (non-id) filter: count must run over generated rows
    val resid = read(rows = 10000, parts = 4)
      .where(col("event_type") === "click").agg(count(lit(1)))
    assert(!resid.queryExecution.executedPlan.toString.contains("AGG-PUSHED"))
    assert(resid.head.getLong(0) > 0)
    // grouped aggregate: declined
    val grouped = read(rows = 1000, parts = 2).groupBy("user_id").count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("AGG-PUSHED"))
    assert(grouped.count() > 0)
    // min/max of a GENERATED column (not closed-form): declined, and the
    // value matches a manual reduction over the shared generator
    val mm = read(rows = 1000, parts = 2).agg(max("user_id"))
    assert(!mm.queryExecution.executedPlan.toString.contains("AGG-PUSHED"))
    val expected = (0L until 1000L).map(id =>
      graft.sources.SynthSource.userId(42, id)).max
    assert(mm.head.getLong(0) == expected)
  }

  test("source rows match the shared generator functions exactly") {
    val local = (0L until 100L).map(id => (id,
      graft.sources.SynthSource.userId(42, id),
      graft.sources.SynthSource.value(42, id)))
    val fromSource = read(rows = 100, parts = 3)
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(fromSource == local)
  }
}
