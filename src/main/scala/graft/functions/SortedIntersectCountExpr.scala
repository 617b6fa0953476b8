package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: intersection SIZE of two SORTED, DISTINCT,
  * null-free string arrays via a single linear merge — no per-row hash
  * set, no output array materialization.
  *
  * Why a dedicated expression when `array_intersect` exists: the built-in
  * builds a hash set per invocation and materializes the intersection
  * array even when only its size is consumed; on the corpus-dedup verify
  * path (millions of candidate pairs per batch) that allocation and
  * hashing dominated the whole query — measured ~18 s of a 22 s dedup
  * run at sf0.1, re-evaluated by filter and project stages. The merge
  * loop reads each element at most once, allocates nothing, stays inside
  * whole-stage codegen, and exploits the sortedness the pipeline already
  * guarantees (`array_sort(array_distinct(...))`).
  *
  * Ordering contract: inputs must be sorted by Spark's binary string
  * order (what `array_sort` produces — `UTF8String.compareTo` is
  * byte-wise unsigned, the same order). Null ELEMENTS poison the result
  * to NULL (the pipeline never produces them; poisoning makes misuse
  * visible instead of silently wrong).
  *
  * Round 13: also accepts (array<bigint>, array<bigint>) — the dedup
  * verify path now merges sorted 64-bit token CODES instead of token
  * strings (8 fixed bytes per element through the candidate join instead
  * of variable-length UTF8 + offsets, and a primitive compare instead of
  * a byte-wise one). Both sides must be the same element type.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  private lazy val longMode: Boolean = isLongSide(left)

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression) = e.dataType match {
      case ArrayType(t @ (StringType | LongType), _) => Some(t)
      case _ => None
    }
    (elem(left), elem(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two arrays of the same element " +
          s"type (string or bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n1 && j < n2) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val cmp =
        if (longMode) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (longMode) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |final int $n1 = $a.numElements();
         |final int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n1 && $j < $n2 && !${ev.isNull}) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final int $cmp = $cmpExpr;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  /** Imperative fallback registration (sessions without GraftExtensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", { exprs =>
        require(exprs.length == 2,
          s"sorted_intersect_count expects 2 arguments (same-type string or bigint arrays), got ${exprs.length}")
        SortedIntersectCountExpr(exprs(0), exprs(1))
      }, "scala_udf")
}
