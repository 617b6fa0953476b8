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
              LIMIT 1""")),

    // Gini coefficient of per-user event volume — the standard
    // concentration metric (0 = uniform, →1 = one user dominates).
    // Computed from the rank formula G = (2·Σi·x_i − (n+1)·Σx_i)/(n·Σx_i)
    // with x ascending: every sum is an exact BIGINT over the COMPRESSED
    // user grain (the fact scan reduces to one row per user first — the
    // evt_pareto_share pattern). The user grain is still unbounded, so
    // the global rank comes from ScalableCumulate's bucketed two-pass
    // row number, never a single-task window; swapping tied x values
    // cannot change Σi·x_i, so the (x, user_id) tiebreak is for rank
    // determinism only. One final fixed-order float expression.
    Spec("evt_gini",
      (s, d) => {
        val u = t(s, d, "events").groupBy("user_id")
          .agg(count(lit(1)).as("x"))
        val r = ScalableCumulate.rowNumber(u, col("x"), ascending = true,
          Seq(asc("x"), asc("user_id")), "i")._1.select(col("x"), col("i"))
        r.agg(count(lit(1)).as("n"), sum("x").as("s1"),
            sum(col("i") * col("x")).as("swi"))
          .select(col("n").as("n_users"), col("s1").as("total_events"),
            round((lit(2.0) * col("swi") - (col("n") + lit(1L)) * col("s1")) /
              (lit(1.0) * col("n") * col("s1")), 6).as("gini"))
      },
      Some("""WITH u AS (
                SELECT user_id, count(*) AS x FROM events GROUP BY 1),
              r AS (
                SELECT x, CAST(row_number() OVER (ORDER BY x, user_id)
                  AS BIGINT) AS i
                FROM u),
              s AS (
                SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s1,
                       CAST(sum(i * x) AS BIGINT) AS swi
                FROM r)
              SELECT n AS n_users, s1 AS total_events,
                     round((2.0 * swi - (n + 1) * s1) / (1.0 * n * s1), 6)
                       AS gini
              FROM s""")),

    // Benford first-digit audit of o_totalprice — the classic fraud /
    // data-fabrication screen. The leading digit comes from the INTEGER
    // part's decimal string (floor → BIGINT → first char), never from
    // log10 on a double, so digit assignment is exact on both engines;
    // expected Benford shares are pinned as integer basis-point literals
    // (log10(1+1/d) pre-rounded) rather than computed through each
    // engine's libm. Shares are floor-scaled integer division over a
    // 9-row digit grain with an unbounded-frame total — no float, no
    // second aggregation, no 1-row join.
    Spec("agg_benford",
      (s, d) => {
        val wAll = Window.orderBy("digit")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .withColumn("digit",
            expr("substring(cast(cast(floor(o_totalprice) as bigint) as string), 1, 1)"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(wAll))
          .withColumn("share_bp", expr("(10000 * n) div total"))
          .drop("total")
          .withColumn("benford_bp",
            expr("""CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761
                    WHEN '3' THEN 1249 WHEN '4' THEN 969 WHEN '5' THEN 792
                    WHEN '6' THEN 669 WHEN '7' THEN 580 WHEN '8' THEN 512
                    ELSE 458 END"""))
          .orderBy("digit")
      },
      Some("""SELECT digit, n, (10000 * n) // total AS share_bp,
                CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761
                  WHEN '3' THEN 1249 WHEN '4' THEN 969 WHEN '5' THEN 792
                  WHEN '6' THEN 669 WHEN '7' THEN 580 WHEN '8' THEN 512
                  ELSE 458 END AS benford_bp
              FROM (
                SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                         AS VARCHAR), 1, 1) AS digit,
                       count(*) AS n,
                       CAST(sum(count(*)) OVER (ORDER BY substring(
                         CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) ROWS BETWEEN UNBOUNDED PRECEDING AND
                         UNBOUNDED FOLLOWING) AS BIGINT) AS total
                FROM orders GROUP BY 1)
              ORDER BY digit""")),

    // Quantity-weighted p25/p50/p75 — agg_weighted_median's histogram
    // construction generalized to arbitrary quantiles: ONE cumulative
    // pass over the value-compressed (group, price, Σweight) histogram,
    // then three conditional-min picks with cross-multiplied decimal
    // thresholds (4·cum ≥ wtot, 2·cum ≥ wtot, 4·cum ≥ 3·wtot) — no
    // division, no interpolation, no engine quantile function. The
    // window runs over the histogram grain, never raw facts.
    Spec("agg_weighted_percentile",
      (s, d) => {
        val wdec = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(30, 2))
        val counts = t(s, d, "lineitem")
          .groupBy(col("l_linestatus"), col("l_extendedprice"))
          .agg(sum(wdec).as("w"))
        val w = Window.partitionBy("l_linestatus").orderBy("l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = counts.withColumn("cum", sum("w").over(w))
        val tot = t(s, d, "lineitem").groupBy(col("l_linestatus"))
          .agg(sum(wdec).as("wtot"))
        cum.join(broadcast(tot), "l_linestatus")
          .groupBy("l_linestatus")
          .agg(
            min(when(col("cum") * 4 >= col("wtot"), col("l_extendedprice"))).as("wp25"),
            min(when(col("cum") * 2 >= col("wtot"), col("l_extendedprice"))).as("wp50"),
            min(when(col("cum") * 4 >= col("wtot") * 3, col("l_extendedprice"))).as("wp75"))
          .orderBy("l_linestatus")
      },
      Some("""WITH counts AS (
                SELECT l_linestatus, l_extendedprice,
                       sum(CAST(l_quantity AS DECIMAL(30,2))) AS w
                FROM lineitem GROUP BY 1, 2),
              cum AS (
                SELECT l_linestatus, l_extendedprice,
                       sum(w) OVER (PARTITION BY l_linestatus
                         ORDER BY l_extendedprice ROWS UNBOUNDED PRECEDING) AS cum
                FROM counts),
              tot AS (
                SELECT l_linestatus, sum(CAST(l_quantity AS DECIMAL(30,2))) AS wtot
                FROM lineitem GROUP BY 1)
              SELECT cum.l_linestatus AS l_linestatus,
                     min(CASE WHEN cum * 4 >= wtot THEN l_extendedprice END) AS wp25,
                     min(CASE WHEN cum * 2 >= wtot THEN l_extendedprice END) AS wp50,
                     min(CASE WHEN cum * 4 >= wtot * 3 THEN l_extendedprice END) AS wp75
              FROM cum JOIN tot ON cum.l_linestatus = tot.l_linestatus
              GROUP BY cum.l_linestatus
              ORDER BY 1""")),

    // Session-grain event-type co-occurrence: which behaviors happen in
    // the SAME 5-minute-gap session (market-basket at the session grain —
    // the complement of the adjacent-only transition matrix). Sessions
    // are the standard gap-islands build; the distinct (user, session,
    // type) set self-joins on the session key with a `<` canonical-pair
    // filter (each unordered pair counted once). With a 5-type alphabet
    // the pair relation is ≤ 10 rows after aggregation; the self-join
    // keys on (user_id, grp) so at 100 TB it is one hash shuffle of the
    // per-session type sets, never a fact×fact blowup.
    Spec("evt_session_cooccurrence",
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("tus"))
        val wU = Window.partitionBy("user_id").orderBy("tus")
        val brk = e.withColumn("brk",
          when(lag("tus", 1).over(wU).isNull ||
            col("tus") - lag("tus", 1).over(wU) >= 300000000L, 1).otherwise(0))
        val g = brk.withColumn("grp",
          sum("brk").over(wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val st = g.select("user_id", "grp", "event_type").distinct()
        st.as("a").join(st.as("b"),
            col("a.user_id") === col("b.user_id") &&
            col("a.grp") === col("b.grp") &&
            col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("et_a"), col("b.event_type").as("et_b"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(desc("n_sessions"), asc("et_a"), asc("et_b"))
      },
      Some("""WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
              d1 AS (
                SELECT user_id, event_type, tus,
                  CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                         OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                            >= 300000000
                       THEN 1 ELSE 0 END AS brk
                FROM e),
              g AS (
                SELECT user_id, event_type,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM d1),
              st AS (SELECT DISTINCT user_id, grp, event_type FROM g)
              SELECT a.event_type AS et_a, b.event_type AS et_b,
                     count(*) AS n_sessions
              FROM st a JOIN st b
                ON a.user_id = b.user_id AND a.grp = b.grp
               AND a.event_type < b.event_type
              GROUP BY 1, 2
              ORDER BY n_sessions DESC, et_a, et_b""")),

    // Running peak + max drawdown of the daily series — the resilience
    // readout (how far below the high-water mark did volume fall). Pure
    // integer window arithmetic over the compressed day grain: running
    // max, per-day drawdown from peak, ordered by day. DuckDB's window
    // max of a BIGINT stays BIGINT (max never widens, unlike sum) — no
    // cast gymnastics needed.
    Spec("win_max_drawdown",
      (s, d) => {
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily(s, d)
          .select(col("day"), col("actual"),
            max("actual").over(w).as("peak"))
          .withColumn("drawdown", col("peak") - col("actual"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS actual
                FROM events GROUP BY 1)
              SELECT day, actual,
                     max(actual) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
                     max(actual) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - actual
                       AS drawdown
              FROM daily
              ORDER BY day""")),

    // Spark 4 EXECUTE IMMEDIATE — dynamic SQL: the statement text lives
    // in a session variable and executes with positional `?` parameters
    // bound at parse time (USING), the stored-procedure idiom for
    // metadata-driven pipelines. The data path is ordinary Catalyst SQL;
    // the oracle is the statement with the binding inlined.
    Spec("sql_execute_immediate",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
        s.sql("""SET VAR stmt =
                 'SELECT o_orderstatus, count(*) AS n
                  FROM orders WHERE o_orderpriority IN (?, ?)
                  GROUP BY o_orderstatus ORDER BY o_orderstatus'""")
        s.sql("EXECUTE IMMEDIATE stmt USING '1-URGENT', '5-LOW'")
      },
      Some("""SELECT o_orderstatus, count(*) AS n
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Weekday × hour activity heatmap — the ops-dashboard staple. Long
    // form (dow, hour, n, share of the weekday's volume in floor basis
    // points) so the oracle is a plain GROUP BY; the share denominator is
    // a weekday-partitioned window sum over the ≤168-row grid, exact
    // integers throughout. Convention trap stated in the oracle: Spark's
    // dayofweek is 1=Sunday..7, DuckDB's is 0=Sunday..6 — hence the +1.
    Spec("evt_hourly_heatmap",
      (s, d) => {
        val g = t(s, d, "events")
          .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val wD = Window.partitionBy("dow")
        g.withColumn("dow_total", sum("n").over(wD))
          .withColumn("share_bp", expr("(10000 * n) div dow_total"))
          .drop("dow_total")
          .orderBy("dow", "hr")
      },
      Some("""WITH g AS (
                SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, count(*) AS n
                FROM events GROUP BY 1, 2)
              SELECT dow, hr, n,
                (10000 * n) // CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT)
                  AS share_bp
              FROM g
              ORDER BY dow, hr""")),

    // SQL join-strategy hints — the escape hatch when the optimizer's
    // size estimates are wrong (a "small" dim that will explode after a
    // filter-join, a broadcast that would OOM). /*+ MERGE(supplier) */
    // forces a sort-merge join where stats would pick broadcast-hash;
    // JoinHintSpec asserts the physical plan actually flips and that a
    // BROADCAST hint flips it back. Results are strategy-invariant, so
    // the oracle is the plain join.
    Spec("sql_join_hints",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT /*+ MERGE(supplier) */
                   n_name, count(*) AS n_suppliers,
                   CAST(round(sum(CAST(s_acctbal AS DECIMAL(30,2))), 2)
                     AS DOUBLE) AS total_bal
                 FROM supplier JOIN nation ON s_nationkey = n_nationkey
                 GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, count(*) AS n_suppliers,
                CAST(round(sum(CAST(s_acctbal AS DECIMAL(30,2))), 2)
                  AS DOUBLE) AS total_bal
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Calendar-gap detection: a day ladder generated from the observed
    // [min, max] range (sequence + explode over a ONE-ROW aggregate — no
    // cross join, no recursion) left-joined back to the daily counts;
    // days with zero events surface with n = 0 instead of silently
    // missing from the report. The ladder side is O(days) and broadcast;
    // the daily side is the usual distributed compression of the fact.
    Spec("evt_missing_days",
      (s, d) => {
        val dd = daily(s, d)
        val ladder = dd.agg(min("day").as("mn"), max("day").as("mx"))
          .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
        ladder.join(dd, Seq("day"), "left")
          .select(col("day"), coalesce(col("actual"), lit(0L)).as("n"),
            col("actual").isNull.as("is_gap"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS actual
                FROM events GROUP BY 1),
              ladder AS (
                SELECT unnest(generate_series(
                  (SELECT min(day) FROM daily),
                  (SELECT max(day) FROM daily),
                  INTERVAL 1 DAY))::DATE AS day)
              SELECT l.day, coalesce(d.actual, 0) AS n,
                     (d.actual IS NULL) AS is_gap
              FROM ladder l LEFT JOIN daily d ON l.day = d.day
              ORDER BY l.day""")),

    // Skewness + excess kurtosis from EXACT raw moments — the engines'
    // built-in skewness()/kurtosis() differ on sample-vs-population
    // corrections, so neither is used: Σx..Σx⁴ are exact decimal sums
    // (l_quantity has 2 decimals → x⁴ has 8; DECIMAL(38,8) holds ~1e9
    // rows of 100⁴-scale terms), converted once to double, and the
    // population g1/g2 formulas are written in the same operation order
    // on both engines (v^1.5 as v*sqrt(v) — sqrt is IEEE correctly
    // rounded, libm pow is not). One distributed agg, 3-row final expr.
    Spec("agg_higher_moments",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val x = col("l_quantity")
        val stats = t(s, d, "lineitem").groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(x.cast(DecimalType(38, 2))).cast("double").as("s1"),
          sum((x * x).cast(DecimalType(38, 4))).cast("double").as("s2"),
          sum((x * x * x).cast(DecimalType(38, 6))).cast("double").as("s3"),
          sum((x * x * x * x).cast(DecimalType(38, 8))).cast("double").as("s4"))
        stats.select(col("l_returnflag"), col("n"),
            (col("s1") / col("n")).as("m"),
            (col("s2") / col("n")).as("r2"),
            (col("s3") / col("n")).as("r3"),
            (col("s4") / col("n")).as("r4"))
          .select(col("l_returnflag"), col("n"),
            round(col("m"), 6).as("mean"),
            round(
              (col("r3") - lit(3.0) * col("m") * col("r2") +
                lit(2.0) * col("m") * col("m") * col("m")) /
              ((col("r2") - col("m") * col("m")) *
                sqrt(col("r2") - col("m") * col("m"))), 6).as("skewness"),
            round(
              (col("r4") - lit(4.0) * col("m") * col("r3") +
                lit(6.0) * col("m") * col("m") * col("r2") -
                lit(3.0) * col("m") * col("m") * col("m") * col("m")) /
              ((col("r2") - col("m") * col("m")) * (col("r2") - col("m") * col("m")))
                - lit(3.0), 6).as("excess_kurtosis"))
          .orderBy("l_returnflag")
      },
      Some("""WITH s AS (
                SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS s1,
                  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s2,
                  CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3,
                  CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s4
                FROM lineitem GROUP BY l_returnflag),
              m AS (
                SELECT l_returnflag, n,
                  s1 / n AS m, s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
                FROM s)
              SELECT l_returnflag, n,
                round(m, 6) AS mean,
                round((r3 - 3.0 * m * r2 + 2.0 * m * m * m)
                      / ((r2 - m * m) * sqrt(r2 - m * m)), 6) AS skewness,
                round((r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m)
                      / ((r2 - m * m) * (r2 - m * m)) - 3.0, 6) AS excess_kurtosis
              FROM m
              ORDER BY l_returnflag""")),

    // Inter-arrival-time histogram: per-user consecutive event gaps
    // bucketed into human bands (sub-minute … over-a-day). Gaps are
    // exact integer microseconds from one lag over the user-keyed
    // shuffle; bucket edges are integer literals so assignment cannot
    // round-tie. The arrival-process readout next to evt_session_stats
    // (same shuffle key — at 100 TB both run off one repartition).
    Spec("evt_inter_event_hist",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("tus"))
          .withColumn("gap_us", col("tus") - lag("tus", 1).over(w))
          .where(col("gap_us").isNotNull)
          .withColumn("bucket_id",
            when(col("gap_us") < 60L * 1000000, 0)
              .when(col("gap_us") < 600L * 1000000, 1)
              .when(col("gap_us") < 3600L * 1000000, 2)
              .when(col("gap_us") < 21600L * 1000000, 3)
              .when(col("gap_us") < 86400L * 1000000, 4)
              .otherwise(5))
          .groupBy("bucket_id")
          .agg(count(lit(1)).as("n"))
          .withColumn("bucket",
            expr("""CASE bucket_id WHEN 0 THEN '<1m' WHEN 1 THEN '1-10m'
                    WHEN 2 THEN '10-60m' WHEN 3 THEN '1-6h'
                    WHEN 4 THEN '6-24h' ELSE '>1d' END"""))
          .orderBy("bucket_id")
      },
      Some("""WITH g AS (
                SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    AS gap_us
                FROM events),
              b AS (
                SELECT CASE WHEN gap_us < 60000000 THEN 0
                            WHEN gap_us < 600000000 THEN 1
                            WHEN gap_us < 3600000000 THEN 2
                            WHEN gap_us < 21600000000 THEN 3
                            WHEN gap_us < 86400000000 THEN 4
                            ELSE 5 END AS bucket_id
                FROM g WHERE gap_us IS NOT NULL)
              SELECT bucket_id, count(*) AS n,
                CASE bucket_id WHEN 0 THEN '<1m' WHEN 1 THEN '1-10m'
                  WHEN 2 THEN '10-60m' WHEN 3 THEN '1-6h'
                  WHEN 4 THEN '6-24h' ELSE '>1d' END AS bucket
              FROM b GROUP BY bucket_id
              ORDER BY bucket_id""")),

    // Growth accounting (new / retained / resurrected / churned per
    // week) — the standard user-lifecycle state machine. All state
    // derives from ONE lag/lead pass over the distinct (user, week)
    // grain: no prev row = new, prev = wk−7 = retained, older prev =
    // resurrected; churn is EMITTED FORWARD onto week wk+7 when the next
    // active week isn't adjacent (so churned(w) = users active in w−7
    // but not w), then clipped to the observed activity range via an
    // unbounded window over the tiny (week, stage) counts grain — no
    // 1-row join. "Active" = a high-value purchase (value > 90) that
    // week — the raw event stream is dense enough that every user is
    // active every week, which would leave the resurrected branch dead
    // code; the measured threshold exercises all four states. Identity
    // new+retained+resurrected = weekly actives holds by construction;
    // everything is exact integers.
    Spec("evt_lifecycle",
      (s, d) => {
        val uw = t(s, d, "events")
          .where(col("event_type") === "purchase" && col("value") > 90)
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("wk")
        val f = uw
          .withColumn("prev", lag("wk", 1).over(w))
          .withColumn("nxt", lead("wk", 1).over(w))
        val active = f.select(col("wk"),
          when(col("prev").isNull, "new")
            .when(datediff(col("wk"), col("prev")) === 7, "retained")
            .otherwise("resurrected").as("stage"))
        val churn = f
          .where(col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7)
          .select(date_add(col("wk"), 7).as("wk"), lit("churned").as("stage"))
        val counts = active.unionByName(churn)
          .groupBy("wk", "stage").agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        counts
          .withColumn("maxwk",
            max(when(col("stage") =!= "churned", col("wk"))).over(wAll))
          .where(col("wk") <= col("maxwk"))
          .groupBy("wk")
          .agg(sum(when(col("stage") === "new", col("n")).otherwise(0L)).as("n_new"),
            sum(when(col("stage") === "retained", col("n")).otherwise(0L)).as("n_retained"),
            sum(when(col("stage") === "resurrected", col("n")).otherwise(0L)).as("n_resurrected"),
            sum(when(col("stage") === "churned", col("n")).otherwise(0L)).as("n_churned"))
          .orderBy("wk")
      },
      Some("""WITH uw AS (
                SELECT DISTINCT user_id,
                  CAST(date_trunc('week', ts) AS DATE) AS wk
                FROM events
                WHERE event_type = 'purchase' AND "value" > 90),
              f AS (
                SELECT user_id, wk,
                  lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
                  lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
                FROM uw),
              staged AS (
                SELECT wk,
                  CASE WHEN prev IS NULL THEN 'new'
                       WHEN wk - prev = 7 THEN 'retained'
                       ELSE 'resurrected' END AS stage
                FROM f
                UNION ALL
                SELECT wk + 7, 'churned'
                FROM f WHERE nxt IS NULL OR nxt - wk > 7),
              counts AS (
                SELECT wk, stage, count(*) AS n FROM staged GROUP BY 1, 2),
              capped AS (
                SELECT *,
                  max(CASE WHEN stage <> 'churned' THEN wk END) OVER () AS maxwk
                FROM counts)
              SELECT wk,
                CAST(sum(CASE WHEN stage = 'new' THEN n ELSE 0 END) AS BIGINT) AS n_new,
                CAST(sum(CASE WHEN stage = 'retained' THEN n ELSE 0 END) AS BIGINT) AS n_retained,
                CAST(sum(CASE WHEN stage = 'resurrected' THEN n ELSE 0 END) AS BIGINT) AS n_resurrected,
                CAST(sum(CASE WHEN stage = 'churned' THEN n ELSE 0 END) AS BIGINT) AS n_churned
              FROM capped WHERE wk <= maxwk
              GROUP BY wk ORDER BY wk""")),

    // Engagement-depth histogram: how many of the observed weeks is each
    // user active in (1..n_weeks), then the user count per depth — the
    // companion readout to evt_lifecycle (same distinct (user, week)
    // grain, one extra fold). Exact integers, two tiny shuffles.
    Spec("evt_active_weeks_hist",
      (s, d) => t(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
        .groupBy("user_id").agg(count(lit(1)).as("n_weeks"))
        .groupBy("n_weeks").agg(count(lit(1)).as("n_users"))
        .orderBy("n_weeks"),
      Some("""SELECT n_weeks, count(*) AS n_users FROM (
                SELECT user_id, count(*) AS n_weeks FROM (
                  SELECT DISTINCT user_id,
                    CAST(date_trunc('week', ts) AS DATE) AS wk
                  FROM events)
                GROUP BY user_id)
              GROUP BY n_weeks ORDER BY n_weeks"""))
  )
}
