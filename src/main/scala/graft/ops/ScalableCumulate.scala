package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed two-pass replacement for unpartitioned running-sum windows —
  * `win_rank_scalable`'s machinery (ops/Windows.scala) lifted into a shared
  * helper so every global-order cumulation in the repo runs partitioned.
  *
  * The hazard it retires: `Window.orderBy(x)` with no partition key plans
  * `Exchange SinglePartition` + a single-task sort of the ENTIRE input — fine
  * on a dim table, a one-executor bottleneck on any unbounded grain (order
  * values, users, vocabulary, eval vectors) at 100 TB. The two-pass shape:
  *
  *  - Pass 0 (bounded driver job): approx-percentile bounds of the primary
  *    order column split the domain into [[NB]] order-compatible buckets.
  *    Equal values never straddle a bucket (strict `<` against each bound),
  *    so bucket-local cumulation + a per-bucket offset equals the global
  *    cumulation. Bounds only shape bucket SIZES — the output depends solely
  *    on value order, so results are deterministic even though the sketch
  *    is not guaranteed to be.
  *  - Pass 1 (bounded driver job): per-(group, bucket) partial sums — at most
  *    |groups|·NB rows — collected and prefix-summed on the driver in EXACT
  *    arithmetic (Long / Integer / BigDecimal only; Double partials are
  *    rejected because float prefix-reassociation would change bits).
  *  - Pass 2 (the query's plan): broadcast the offsets back, run the window
  *    `partitionBy(group, bucket)` — NB-way (× groups) parallel, no
  *    SinglePartition exchange anywhere.
  *
  * The two driver collects are the same bounded class as the centroid-model
  * collect (InferMapPartitions.scala): O(NB·|groups|) longs/decimals, never
  * data-sized. PlanGuardSpec's unpartitioned-window guard enforces that the
  * routed queries stay on this path.
  */
object ScalableCumulate {

  /** Bucket fan-out. 16 ≥ local[8]/local[32] parallelism per group; at a
    * real 1000-executor deployment this is the one knob to raise (shuffle
    * width is NB·|groups| tasks).
    */
  val NB = 16

  /** One cumulative sum to compute: output column `name` = running sum of
    * `value` over the global order (within the group, if grouped).
    */
  final case class Cum(name: String, value: Column)

  private def zero(dt: DataType): Any = dt match {
    case LongType       => java.lang.Long.valueOf(0L)
    case IntegerType    => Integer.valueOf(0)
    case _: DecimalType => java.math.BigDecimal.ZERO
    case other => throw new IllegalArgumentException(
      s"ScalableCumulate requires exact partial-sum types (long/int/decimal); got $other")
  }

  private def plus(a: Any, b: Any): Any = (a, b) match {
    case (x, null) => x
    case (null, x) => x
    case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.valueOf(x + y)
    case (x: Integer, y: Integer)               => Integer.valueOf(x + y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
    case (x, y) => throw new IllegalArgumentException(
      s"non-exact or mismatched partials: ${x.getClass} + ${y.getClass}")
  }

  /** Core rewrite. Returns `df` plus, for each [[Cum]], its global running
    * sum over `orderCols` (ROWS UNBOUNDED PRECEDING..CURRENT ROW, within
    * `groupCols` if given) and, for each entry in `totals` (cum name →
    * total column name), the group-wide grand total — all WITHOUT an
    * unpartitioned window. The transient `__bkt` column is dropped.
    *
    * `primary` must be the leading order column (numeric; cast to double
    * only for bucket ASSIGNMENT — double cast is monotone, and ties map to
    * the same bucket, so ordering is never violated). `ascending` must match
    * the sort direction of `primary` inside `orderCols`. Inputs are assumed
    * non-null in `primary` (every call site cumulates over non-null keys).
    */
  def cumSum(
      df: DataFrame,
      primary: Column,
      ascending: Boolean,
      orderCols: Seq[Column],
      cums: Seq[Cum],
      groupCols: Seq[String] = Nil,
      totals: Map[String, String] = Map.empty): DataFrame =
    core(df, primary, ascending, orderCols, cums, groupCols, totals)._1

  /** Global row number (1-based, ungrouped) over `orderCols`, plus the total
    * row count (driver-side, free — it is the last prefix offset). The
    * scalable form of `row_number().over(Window.orderBy(...))`; feed the
    * count to [[ntileOf]] / cume-dist picks.
    */
  def rowNumber(
      df: DataFrame,
      primary: Column,
      ascending: Boolean,
      orderCols: Seq[Column],
      out: String): (DataFrame, Long) = {
    val (res, tot) = core(df, primary, ascending, orderCols,
      Seq(Cum(out, lit(1L))), Nil, Map.empty)
    val n = tot.getOrElse(Seq.empty, Map.empty)
      .getOrElse(out, java.lang.Long.valueOf(0L))
      .asInstanceOf[java.lang.Long].longValue()
    (res, n)
  }

  /** Exact integer division of a non-negative long column by a positive
    * driver-side constant: the dividend is reduced to an exact multiple
    * first, so the double division is exact whenever the QUOTIENT is (here
    * quotients are ≤ the ntile count — tiny).
    */
  private def idiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast(LongType)

  /** SQL `ntile(k)` computed from a 1-based global row number and the total
    * row count: the first `n % k` tiles get `n/k + 1` rows, the rest `n/k`
    * — the standard-SQL split Spark and DuckDB both implement. LongType
    * output; cast at the call site to match the declared schema.
    */
  def ntileOf(rn: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    if (q == 0) rn.cast(LongType) // fewer rows than tiles: row i is tile i
    else
      when(rn <= lit((q + 1) * r), idiv(rn - 1, q + 1) + 1)
        .otherwise(lit(r) + idiv(rn - 1 - lit((q + 1) * r), q) + 1)
  }

  private def core(
      df: DataFrame,
      primary: Column,
      ascending: Boolean,
      orderCols: Seq[Column],
      cums: Seq[Cum],
      groupCols: Seq[String],
      totals: Map[String, String])
      : (DataFrame, Map[Seq[Any], Map[String, Any]]) = {
    val spark = df.sparkSession
    val pd = primary.cast(DoubleType)

    // Pass 0: percentile bounds of the primary order key. Duplicate bounds
    // (low-cardinality keys) just yield empty buckets — harmless.
    val qs = (1 until NB).map(i => i.toDouble / NB)
    val boundsRow = df.agg(
      percentile_approx(pd, array(qs.map(lit): _*), lit(10000)).as("b")).head()
    val bounds: Seq[Double] =
      if (boundsRow.isNullAt(0)) Seq.empty else boundsRow.getSeq[Double](0)
    val bkt = bounds.foldLeft(lit(0)) { (acc, b) =>
      if (ascending) acc + when(lit(b) < pd, 1).otherwise(0)
      else acc + when(pd < lit(b), 1).otherwise(0)
    }
    val withB = df.withColumn("__bkt", bkt)

    // Pass 1: per-(group, bucket) exact partials → driver prefix sums.
    val aggExprs = cums.map(c => sum(c.value).as(c.name))
    val keyCols = groupCols.map(col) :+ col("__bkt")
    val part = withB.groupBy(keyCols: _*).agg(aggExprs.head, aggExprs.tail: _*)
    val partSchema = part.schema
    val ng = groupCols.size
    val cumTypes = cums.map(c => partSchema(c.name).dataType)
    cumTypes.foreach(zero) // reject non-exact partial types up front

    val byGroup: Map[Seq[Any], Array[Row]] =
      part.collect().groupBy(r => (0 until ng).map(r.get).toSeq)
    val offRows = mutable.ArrayBuffer.empty[Row]
    val grandTotals = mutable.Map.empty[Seq[Any], Map[String, Any]]
    for ((gkey, grs) <- byGroup) {
      val sorted = grs.sortBy(_.getInt(ng))
      var running: Seq[Any] = cumTypes.map(zero)
      val pending = mutable.ArrayBuffer.empty[(Int, Seq[Any])]
      for (r <- sorted) {
        pending += ((r.getInt(ng), running))
        running = cums.indices.map(i => plus(running(i), r.get(ng + 1 + i)))
      }
      grandTotals(gkey) =
        cums.indices.map(i => cums(i).name -> running(i)).toMap
      for ((b, offs) <- pending)
        offRows += Row.fromSeq(gkey ++ Seq(b) ++ offs ++
          cums.indices.collect {
            case i if totals.contains(cums(i).name) => running(i)
          })
    }

    val offSchema = StructType(
      groupCols.map(g => partSchema(g)) ++
        Seq(StructField("__bkt", IntegerType, nullable = false)) ++
        cums.map(c =>
          StructField("__off_" + c.name, partSchema(c.name).dataType)) ++
        cums.collect {
          case c if totals.contains(c.name) =>
            StructField(totals(c.name), partSchema(c.name).dataType)
        })
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows.toSeq: _*), offSchema)

    // Pass 2: broadcast offsets, partitioned window, exact offset add.
    val w = Window
      .partitionBy((groupCols :+ "__bkt").map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = withB.join(broadcast(offDf), groupCols :+ "__bkt")
    for (c <- cums)
      out = out.withColumn(c.name, sum(c.value).over(w) + col("__off_" + c.name))
    (out.drop(cums.map("__off_" + _.name): _*).drop("__bkt"), grandTotals.toMap)
  }
}
