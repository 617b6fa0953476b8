package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration seam: `--conf spark.sql.extensions=graft.GraftExtensions`
  * installs every graft extension at session build time — the documented
  * public hook (`SparkSessionExtensions`), preferable to per-session
  * imperative registration because it also applies to sessions graft code
  * never touches (thrift server, connect, notebooks).
  *
  * Installs:
  *  - [[graft.plans.AsOfJoinStrategy]] — plans [[graft.plans.AsOfJoinPlan]]
  *    as the single-pass merge exec (`injectPlannerStrategy`).
  *  - `dot_product(array<float>, array<float>)` — the codegen'd
  *    [[graft.functions.DotProductExpr]] (`injectFunction`), usable from SQL
  *    text without any imperative `register` call.
  *
  * `Asof.join` / `DotProductExpr.register` remain as imperative fallbacks
  * for sessions built without the conf; both are idempotent when the
  * extension already installed the hook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    // range-join auto-binning (Rule[LogicalPlan], operator-optimization batch)
    ext.injectOptimizerRule(_ => new graft.plans.RangeBinJoinRule)
    // interval-OVERLAP auto-binning (two-sided generalization; registered
    // after RangeBinJoinRule so the one-sided rule wins the point-range
    // shape both can express)
    ext.injectOptimizerRule(_ => new graft.plans.OverlapBinJoinRule)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProductExpr].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product expects 2 arguments (array<float>, array<float>), got ${exprs.length}")
        graft.functions.DotProductExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim expects 2 arguments (array<float>, array<float>), got ${exprs.length}")
        graft.functions.CosineSimExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectCountExpr].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"sorted_intersect_count expects 2 arguments (same-type string or bigint arrays), got ${exprs.length}")
        graft.functions.SortedIntersectCountExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[graft.functions.NGramsGenerator].getName, "ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"ngrams expects 2 arguments (array<string>, int), got ${exprs.length}")
        graft.functions.NGramsGenerator(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[graft.functions.KllQuantilesAgg].getName, "kll_quantiles"),
      graft.functions.KllQuantilesAgg.builder _))
    ext.injectFunction((
      FunctionIdentifier("mg_heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName, "mg_heavy_hitters"),
      graft.functions.MisraGriesAgg.builder _))
  }
}
