package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (KLL/MRL compactor hierarchy) used by
  * `kll_quantiles`. Level i holds items of weight 2^i, each level capped at
  * `k` items; a full level sorts, keeps alternate items (parity flips per
  * compaction — deterministic, no RNG: determinism is a repo-wide oracle
  * requirement), and promotes them to level i+1. Space is O(k·log(n/k)) —
  * ~130 KB per group at k=512 even for 10^12-row groups, so executor state
  * stays bounded at 100 TB scale while the exact `percentile` would buffer
  * the whole group.
  *
  * Normalized rank error for uniform-capacity compactors is
  * O(log(n/k)/k); k=512 keeps observed error well under 2% at 10^6 rows
  * (the declared query asserts a 5% band; KllSketchSpec measures it).
  */
final class QuantileSketch(val k: Int) extends Serializable {
  // levels(i): unsorted buffer of values with weight 2^i
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  val parity: ArrayBuffer[Boolean] = ArrayBuffer(false)
  var count: Long = 0L

  def update(v: Double): Unit = {
    levels(0) += v
    count += 1
    if (levels(0).length >= k) compact(0)
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) { levels += ArrayBuffer.empty[Double]; parity += false }

  private def compact(i: Int): Unit = {
    ensureLevel(i + 1)
    val buf = levels(i)
    val sorted = buf.sortInPlace() // ascending
    val start = if (parity(i)) 1 else 0
    parity(i) = !parity(i)
    var j = start
    val up = levels(i + 1)
    while (j < sorted.length) { up += sorted(j); j += 2 }
    levels(i) = ArrayBuffer.empty[Double]
    if (up.length >= k) compact(i + 1)
  }

  def merge(other: QuantileSketch): QuantileSketch = {
    var i = 0
    while (i < other.levels.length) {
      ensureLevel(i)
      levels(i) ++= other.levels(i)
      i += 1
    }
    count += other.count
    var l = 0
    while (l < levels.length) { // re-establish caps bottom-up
      if (levels(l).length >= k) compact(l)
      l += 1
    }
    this
  }

  /** Smallest retained value whose cumulative weight reaches rank q·count. */
  def quantile(q: Double): Double = quantiles(Array(q))(0)

  /** All probes answered against ONE weighted sort of the retained items. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * count).toLong)
      var cum = 0L
      var idx = 0
      var ans = if (sorted.nonEmpty) sorted.last._1 else Double.NaN
      var found = false
      while (idx < sorted.length && !found) {
        cum += sorted(idx)._2
        if (cum >= target) { ans = sorted(idx)._1; found = true }
        idx += 1
      }
      ans
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(count); out.writeInt(levels.length)
    levels.indices.foreach { i =>
      out.writeBoolean(parity(i))
      out.writeInt(levels(i).length)
      levels(i).foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QuantileSketch(in.readInt())
    s.count = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      while (s.levels.length <= i) { s.levels += ArrayBuffer.empty[Double]; s.parity += false }
      s.parity(i) = in.readBoolean()
      val m = in.readInt()
      val buf = s.levels(i)
      var j = 0
      while (j < m) { buf += in.readDouble(); j += 1 }
      i += 1
    }
    s
  }
}

/** `kll_quantiles(value, array(q1, q2, ...)[, k])` — TypedImperativeAggregate
  * over a [[QuantileSketch]]: the custom-aggregation seam beyond HLL++
  * (SURVEY §4 names this hook). Returns array<double> of estimated
  * quantile values (actual retained data values, not interpolations).
  * Partial aggregation works map-side (serialize/merge), so the shuffle
  * carries one ≤O(k·log n) sketch per group per partition instead of the
  * group's rows — the 100 TB shape for percentile work.
  */
case class KllQuantilesAgg(
    child: Expression,
    probesExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch] {

  // Accept any foldable numeric array — SQL users naturally write
  // array(0.5, 0.9), which is DECIMAL-typed; coerce element-wise instead
  // of assuming array<double>.
  private lazy val probes: Array[Double] = {
    val (arr, elemType) = probesExpr match {
      case Literal(a: ArrayData, ArrayType(et, _)) => (a, et)
      case e => e.eval(InternalRow.empty) match {
        case a: ArrayData => (a, e.dataType match {
          case ArrayType(et, _) => et
          case _ => throw new IllegalArgumentException(
            "kll_quantiles: probes must be an array of numbers")
        })
        case _ => throw new IllegalArgumentException(
          "kll_quantiles: probes must be a literal array of numbers")
      }
    }
    (0 until arr.numElements()).map { i =>
      arr.get(i, elemType) match {
        case d: Double => d
        case f: Float => f.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"kll_quantiles: non-numeric probe $other")
      }
    }.toArray
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles expects a numeric value column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buffer: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case LongType => v.asInstanceOf[Long].toDouble
      case ShortType => v.asInstanceOf[Short].toDouble
      case ByteType => v.asInstanceOf[Byte].toDouble
      case _: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case other => throw new IllegalStateException(s"unsupported $other")
    })
    buffer
  }

  override def merge(buffer: QuantileSketch, input: QuantileSketch): QuantileSketch =
    buffer.merge(input)

  override def eval(buffer: QuantileSketch): Any =
    if (buffer.count == 0L) null
    else new GenericArrayData(buffer.quantiles(probes))

  override def serialize(buffer: QuantileSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child, probesExpr)
  override def prettyName: String = "kll_quantiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = newChildren(0), probesExpr = newChildren(1))
}

object KllQuantilesAgg {
  val DefaultK = 512

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2 || exprs.length == 3,
      s"kll_quantiles expects (value, probes[, k]), got ${exprs.length} args")
    val k = if (exprs.length == 3) exprs(2) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: k must be an integer literal, got $other")
    } else DefaultK
    KllQuantilesAgg(exprs.head, exprs(1), k)
  }

  /** Imperative fallback mirroring [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles", builder, "scala_udf")
}
