package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScalableCumulate
import graft.ops.ScalableCumulate.Cum

/** Differential tests: the bucketed two-pass must produce BIT-identical
  * results to the unpartitioned window it replaces, across type (long /
  * decimal), direction (asc / desc), grouping, and the row-number / ntile
  * derivations — plus the plan property the whole exercise is for: no
  * empty-partition-spec Window and no SinglePartition exchange above one.
  */
class ScalableCumulateSpec extends AnyFunSuite {
  import TestSpark._
  import Tables.t

  private def sortedRows(df: org.apache.spark.sql.DataFrame, cols: String*) =
    df.select(cols.map(col): _*).orderBy(cols.map(col): _*).collect().toSeq

  test("long cumsum over asc order matches unpartitioned window") {
    val h = t(spark, sf, "orders")
      .groupBy(col("o_totalprice").as("x")).agg(count(lit(1)).as("cnt"))
    val naive = h.withColumn("cum",
      sum("cnt").over(Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val two = ScalableCumulate.cumSum(h, col("x"), ascending = true,
      Seq(col("x")), Seq(Cum("cum", col("cnt"))))
    assert(sortedRows(two, "x", "cnt", "cum") ==
      sortedRows(naive, "x", "cnt", "cum"))
  }

  test("decimal cumsum + total over desc order matches unpartitioned window") {
    val rev = t(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(30, 4))).as("rev"))
    val ord = Window.orderBy(desc("rev"), asc("l_partkey"))
    val naive = rev
      .withColumn("cum", sum("rev").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("rev").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val two = ScalableCumulate.cumSum(rev, col("rev"), ascending = false,
      Seq(desc("rev"), asc("l_partkey")), Seq(Cum("cum", col("rev"))),
      totals = Map("cum" -> "tot"))
    assert(sortedRows(two, "l_partkey", "rev", "cum", "tot") ==
      sortedRows(naive, "l_partkey", "rev", "cum", "tot"))
  }

  test("grouped cumsum matches per-group unpartitioned-value window") {
    val counts = t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"), col("o_totalprice"))
      .agg(count(lit(1)).as("c"))
    val naive = counts.withColumn("cum",
      sum("c").over(Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val two = ScalableCumulate.cumSum(counts, col("o_totalprice"),
      ascending = true, Seq(col("o_totalprice")), Seq(Cum("cum", col("c"))),
      groupCols = Seq("o_orderpriority"))
    assert(sortedRows(two, "o_orderpriority", "o_totalprice", "cum") ==
      sortedRows(naive, "o_orderpriority", "o_totalprice", "cum"))
  }

  test("rowNumber + ntileOf match row_number and ntile over a total order") {
    val u = t(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"))
    val ord = Window.orderBy(desc("n_ev"), asc("user_id"))
    val naive = u
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("tile", ntile(7).over(ord).cast("long"))
    val (two0, n) = ScalableCumulate.rowNumber(u, col("n_ev"),
      ascending = false, Seq(desc("n_ev"), asc("user_id")), "rn")
    val two = two0.withColumn("tile", ScalableCumulate.ntileOf(col("rn"), n, 7))
    assert(n == u.count())
    assert(sortedRows(two, "user_id", "n_ev", "rn", "tile") ==
      sortedRows(naive, "user_id", "n_ev", "rn", "tile"))
  }

  test("ntileOf handles n < k (each row its own tile)") {
    import spark.implicits._
    val df = Seq(5L, 2L, 9L).toDF("v")
    val naive = df.withColumn("tile",
      ntile(8).over(Window.orderBy("v")).cast("long"))
    val (two0, n) = ScalableCumulate.rowNumber(df, col("v"),
      ascending = true, Seq(col("v")), "rn")
    val two = two0.withColumn("tile", ScalableCumulate.ntileOf(col("rn"), n, 8))
      .drop("rn")
    assert(sortedRows(two, "v", "tile") == sortedRows(naive, "v", "tile"))
  }

  test("two-pass plan has no unpartitioned window and no SinglePartition feed") {
    val h = t(spark, sf, "orders")
      .groupBy(col("o_totalprice").as("x")).agg(count(lit(1)).as("cnt"))
    val two = ScalableCumulate.cumSum(h, col("x"), ascending = true,
      Seq(col("x")), Seq(Cum("cum", col("cnt"))))
    val unpart = two.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "two-pass output still plans an unpartitioned Window")
    assert(!two.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"))
  }

  test("double partials are rejected") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("x", "v")
    intercept[IllegalArgumentException] {
      ScalableCumulate.cumSum(df, col("x"), ascending = true,
        Seq(col("x")), Seq(Cum("cum", col("v"))))
    }
  }
}
