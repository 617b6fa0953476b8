package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 — warehouse-maintenance shapes (round 8): the write-side
  * operations a lakehouse pipeline runs daily, expressed as pure queries so
  * the DuckDB oracle can check them row-for-row:
  *
  *   - MERGE / upsert (three-branch: update, insert, keep) via full outer join
  *   - SCD type-2 dimension history build (change detection + validity ranges)
  *   - per-column data-quality profile (single-pass, unpivoted)
  *   - expectation-suite violation counts (single-pass rule fan-out)
  *
  * Scale notes inline per query; all counts are exact BIGINTs and all money
  * math is exact-decimal before any double cast.
  */
object Warehouse {
  import Tables._

  val all: Seq[Spec] = Seq(
    // MERGE INTO target USING source — the upsert kernel. Target: the
    // customer dim MISSING every third row (a stale snapshot). Source: one
    // row per customer who ordered after 2000-06-01, carrying new spend.
    // Branches: matched+source → update (balance += spend), source-only →
    // insert, target-only → keep. Physics: source aggregates at the
    // custkey grain (one shuffle), then ONE full outer shuffle join on the
    // merge key — the same two-exchange shape Delta/Iceberg MERGE plans at
    // any scale. Every branch is tagged so the oracle checks branch
    // routing, not just final values.
    Spec("sql_merge_upsert",
      (s, d) => {
        val target = t(s, d, "customer").where(col("c_custkey") % 3 =!= 0)
        val cut = lit(java.sql.Timestamp.valueOf("2000-06-01 00:00:00"))
        val source = t(s, d, "orders").where(col("o_orderdate") >= cut)
          .groupBy(col("o_custkey"))
          .agg(msum(col("o_totalprice"), 2).as("spend"))
        target.join(source, col("c_custkey") === col("o_custkey"),
            "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("c_name"), lit("UNKNOWN")).as("name"),
            round(when(col("o_custkey").isNull, col("c_acctbal"))
              .when(col("c_custkey").isNull, col("spend"))
              .otherwise(col("c_acctbal") + col("spend")), 2).as("balance"),
            when(col("o_custkey").isNull, "keep")
              .when(col("c_custkey").isNull, "insert")
              .otherwise("update").as("action"))
          .orderBy("custkey")
      },
      Some("""WITH target AS (
                SELECT * FROM customer WHERE c_custkey % 3 <> 0),
              source AS (
                SELECT o_custkey,
                       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS spend
                FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
                GROUP BY o_custkey)
              SELECT coalesce(c_custkey, o_custkey) AS custkey,
                     coalesce(c_name, 'UNKNOWN') AS name,
                     round(CASE WHEN o_custkey IS NULL THEN c_acctbal
                                WHEN c_custkey IS NULL THEN spend
                                ELSE c_acctbal + spend END, 2) AS balance,
                     CASE WHEN o_custkey IS NULL THEN 'keep'
                          WHEN c_custkey IS NULL THEN 'insert'
                          ELSE 'update' END AS action
              FROM target FULL JOIN source ON c_custkey = o_custkey
              ORDER BY custkey""")),

    // SCD type-2 history build: per user, collapse the event stream into
    // validity ranges of the tracked attribute (event_type), emitting
    // version, valid_from, valid_to (NULL = current) and is_current.
    // Change detection is LAG over (user ORDER BY ts, event_id) — a total
    // order, so the island numbering is deterministic. Two shuffles total:
    // one to the user_id grain shared by both event-level window passes,
    // one to the (user, version, type) island grain for the range collapse
    // (the second window runs on that grain's partitioning unchanged).
    Spec("sql_scd2_history",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val marked = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("changed",
            when(lag("event_type", 1).over(w).isNull ||
              lag("event_type", 1).over(w) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("version", sum("changed").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ranges = marked.groupBy(col("user_id"), col("version"),
            col("event_type"))
          .agg(min("ts").as("valid_from"), max("version").as("v"))
          .drop("v")
        val wv = Window.partitionBy("user_id").orderBy("version")
        ranges
          .withColumn("valid_to", lead("valid_from", 1).over(wv))
          .withColumn("is_current", col("valid_to").isNull)
          .where(col("user_id") % 100 === 7)
          .orderBy("user_id", "version")
      },
      Some("""WITH marked AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(event_type) OVER w IS NULL
                              OR lag(event_type) OVER w <> event_type
                            THEN 1 ELSE 0 END AS changed
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              versioned AS (
                SELECT *, CAST(sum(changed) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
                FROM marked),
              ranges AS (
                SELECT user_id, version, event_type, min(ts) AS valid_from
                FROM versioned GROUP BY 1, 2, 3)
              SELECT user_id, version, event_type, valid_from,
                     lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
                     lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
              FROM ranges
              WHERE user_id % 100 = 7
              ORDER BY user_id, version""")),

    // Per-column data-quality profile of orders: null count, exact distinct
    // count, min/max (stringified under a fixed per-type rule). Two scans,
    // neither of which is the multi-distinct EXPAND (that plan multiplies
    // the fact by the column count through one wide composite agg — it
    // benched 2.9 s at sf0.1 and gets worse with width): (1) a narrow
    // 1-row agg for null counts and typed min/max; (2) a melt via stack()
    // to (column, value-string) pairs — double→string is Spark's
    // shortest-repr, a bijection, so string-distinct equals value-distinct
    // — counted by a two-level groupBy whose map-side partial collapses
    // each partition's duplicates before the shuffle. The distinct shuffle
    // carries only distinct pairs, never the fact multiplied.
    Spec("dq_profile",
      (s, d) => {
        val o = t(s, d, "orders")
        def str(c: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
          o.schema(c).dataType match {
            case DoubleType =>
              (min(col(c)).cast(DecimalType(18, 2)).cast(StringType),
                max(col(c)).cast(DecimalType(18, 2)).cast(StringType))
            case _ => (min(col(c)).cast(StringType), max(col(c)).cast(StringType))
          }
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val aggs = cols.flatMap { c =>
          val (mn, mx) = str(c)
          Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
            mn.as(s"mn_$c"), mx.as(s"mx_$c"))
        }
        val wide = o.agg(aggs.head, aggs.tail: _*)
        val stackExpr = cols.map(c => s"'$c', nn_$c, mn_$c, mx_$c")
          .mkString(s"stack(${cols.size}, ", ", ",
            ") as (column_name, n_null, min_s, max_s)")
        val base = wide.selectExpr(stackExpr)
        val meltExpr = cols.map(c => s"'$c', cast($c as string)")
          .mkString(s"stack(${cols.size}, ", ", ", ") as (column_name, v)")
        val nd = o.selectExpr(meltExpr).where(col("v").isNotNull)
          .groupBy(col("column_name"), col("v")).agg(count(lit(1)).as("c"))
          .groupBy(col("column_name"))
          .agg(count(lit(1)).as("n_distinct"))
        base.join(broadcast(nd), "column_name")
          .select(col("column_name"), col("n_null"), col("n_distinct"),
            col("min_s"), col("max_s"))
          .orderBy("column_name")
      },
      Some("""SELECT 'o_orderkey' AS column_name, count(*) - count(o_orderkey) AS n_null,
                     count(DISTINCT o_orderkey) AS n_distinct,
                     CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM orders
              UNION ALL
              SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
                     CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
              UNION ALL
              SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
                     CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
              UNION ALL
              SELECT 'o_totalprice', count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
                     CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
                     CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
              UNION ALL
              SELECT 'o_orderdate', count(*) - count(o_orderdate), count(DISTINCT o_orderdate),
                     CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM orders
              UNION ALL
              SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
                     CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders
              ORDER BY column_name""")),

    // Expectation-suite audit of lineitem: every rule is a sum(CASE) in ONE
    // single-pass hash agg (no per-rule rescans), unpivoted to one row per
    // rule with exact violation counts and a deterministic violation rate.
    Spec("dq_expectations",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "qty_in_1_50" -> !col("l_quantity").between(1, 50),
          "discount_in_0_0p5" -> !col("l_discount").between(0.0, 0.5),
          "price_positive" -> (col("l_extendedprice") <= 0),
          "shipdate_in_range" -> !col("l_shipdate").between(
            lit(java.sql.Timestamp.valueOf("1994-01-01 00:00:00")),
            lit(java.sql.Timestamp.valueOf("2002-12-31 00:00:00"))),
          "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
          "tax_in_0_0p5" -> !col("l_tax").between(0.0, 0.5))
        val aggs = (count(lit(1)).as("n_rows") +:
          rules.map { case (n, viol) =>
            sum(when(viol, 1L).otherwise(0L)).as(s"v_$n") })
        val wide = li.agg(aggs.head, aggs.tail: _*)
        val stackExpr = rules.map { case (n, _) => s"'$n', v_$n" }
          .mkString(s"stack(${rules.size}, ", ", ", ") as (rule, n_violations)")
        wide.selectExpr("n_rows", stackExpr)
          .select(col("rule"), col("n_violations"),
            round(col("n_violations").cast(DoubleType) / col("n_rows"), 6)
              .as("violation_rate"))
          .orderBy("rule")
      },
      Some("""WITH w AS (
                SELECT count(*) AS n_rows,
                  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
                  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.5) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
                  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
                  CAST(sum(CASE WHEN NOT (l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00'
                                    AND TIMESTAMP '2002-12-31 00:00:00') THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
                  CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
                  CAST(sum(CASE WHEN NOT (l_tax BETWEEN 0.0 AND 0.5) THEN 1 ELSE 0 END) AS BIGINT) AS v_tax
                FROM lineitem)
              SELECT rule, n_violations,
                     round(CAST(n_violations AS DOUBLE) / n_rows, 6) AS violation_rate
              FROM (
                SELECT n_rows, 'qty_in_1_50' AS rule, v_qty AS n_violations FROM w
                UNION ALL SELECT n_rows, 'discount_in_0_0p5', v_disc FROM w
                UNION ALL SELECT n_rows, 'price_positive', v_price FROM w
                UNION ALL SELECT n_rows, 'shipdate_in_range', v_ship FROM w
                UNION ALL SELECT n_rows, 'returnflag_domain', v_flag FROM w
                UNION ALL SELECT n_rows, 'tax_in_0_0p5', v_tax FROM w) u
              ORDER BY rule""")))
}
