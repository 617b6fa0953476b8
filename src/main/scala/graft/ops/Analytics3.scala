package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 analytics (round 8, tranche 3) — forecast-evaluation and
  * changepoint kernels over the daily `events` series. Discipline as in
  * [[Analytics2]]: every accumulation is an exact BIGINT sum; day-grain
  * windows are deliberate ~30-row single-partition stages sitting on top
  * of a distributed fact aggregation (the 100 TB scan reduces to the day
  * grain first, so the unpartitioned window is never a scale hazard).
  */
object Analytics3 {
  import Tables._

  /** Daily event-count series (distributed groupBy; ~30 rows at any SF). */
  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("actual"))

  val all: Seq[Spec] = Seq(
    // Seasonal-naive forecast backtest: predict each day's event count
    // with the value 7 days (rows) earlier, report the per-day absolute
    // percentage error floor-scaled to basis points. BIGINT end to end:
    // counts are exact, and `(10000*|a-p|) div a` is integer division in
    // both engines — no float rounding tie can diverge (the try_divide
    // lesson from the r8 note applied up front).
    Spec("ts_seasonal_mape",
      (s, d) => {
        val w = Window.orderBy("day")
        daily(s, d)
          .withColumn("pred", lag("actual", 7).over(w))
          .where(col("pred").isNotNull)
          .select(col("day"), col("actual"), col("pred"),
            expr("(10000 * abs(actual - pred)) div actual").as("ape_bp"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS actual
                FROM events GROUP BY 1),
              f AS (
                SELECT day, actual, lag(actual, 7) OVER (ORDER BY day) AS pred
                FROM daily)
              SELECT day, actual, pred,
                     (10000 * abs(actual - pred)) // actual AS ape_bp
              FROM f WHERE pred IS NOT NULL
              ORDER BY day""")),

    // CUSUM changepoint: the day maximizing |cumulative deviation from
    // the global daily mean|. The textbook statistic cum(x_k - mean) is
    // float; multiplying through by T gives the EXACT integer score
    // |T*cum_x - k*S| (cum_x = running BIGINT count sum, k = day index,
    // S = total events, T = number of days) with the identical argmax.
    // Ties break to the earliest day. T and S come from an
    // UNBOUNDED-frame window in the SAME single window pass as the
    // running sum — no second aggregation, no 1-row join (a broadcast
    // nested loop the plan guard rightly flags even at 1 build row).
    Spec("ts_cusum_changepoint",
      (s, d) => {
        val w = Window.orderBy("day")
        val wAll = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        daily(s, d)
          .select(col("day"),
            sum("actual").over(w).as("cum_x"),
            row_number().over(w).as("k"),
            sum("actual").over(wAll).as("s1"),
            count(lit(1)).over(wAll).as("t"))
          .select(col("day"),
            abs(col("t") * col("cum_x") - col("k") * col("s1")).as("score"))
          .orderBy(desc("score"), asc("day"))
          .limit(1)
      },
      Some("""WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS actual
                FROM events GROUP BY 1),
              cum AS (
                SELECT day,
                       CAST(sum(actual) OVER (ORDER BY day) AS BIGINT) AS cum_x,
                       CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
                       CAST(sum(actual) OVER (ORDER BY day ROWS BETWEEN
                         UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS s1,
                       count(*) OVER (ORDER BY day ROWS BETWEEN
                         UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS t
                FROM daily)
              SELECT day, abs(t * cum_x - k * s1) AS score
              FROM cum
              ORDER BY score DESC, day
              LIMIT 1"""))
  )
}
