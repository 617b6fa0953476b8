package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 category C (extended) — the achievable TPC-H query shapes
  * (split out of Joins.scala along its per-query seams, round-7 verdict #8;
  * zero behavior change). Q2/Q11/Q12/Q16/Q20 remain data-impossible: the
  * driver testdata carries no partsupp table, l_shipmode, or l_commitdate
  * (recorded in SURVEY round notes every round since r2).
  *
  * Scale design: every query follows the canonical star-join discipline —
  * dimension sides broadcast, fact-side filters push to the parquet scan,
  * aggregates are two-phase hash aggs on the post-join row stream.
  */
object TpchJoins {
  import Tables._

  val all: Seq[Spec] = Seq(
    // TPC-H Q3 shape (shipping priority): filtered dim broadcast into the
    // fact-fact shuffle join, then global top-10 — compiles to
    // TakeOrderedAndProject (no full sort at any scale). Revenue ties are
    // broken by o_orderkey so the limit is deterministic.
    Spec("join_q3_shipping",
      (s, d) => {
        val cut = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
        val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").where(col("o_orderdate") < cut)
        val li = t(s, d, "lineitem").where(col("l_shipdate") > cut)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("o_date"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey,
                 CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
                 o_orderpriority,
                 ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
               FROM lineitem
                 JOIN orders   ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
                 AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
               GROUP BY o_orderkey, o_orderdate, o_orderpriority
               ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // TPC-H Q7 shape (volume shipping between two nations): lineitem joins
    // BOTH supplier-side and customer-side nation dims (two broadcasts of
    // the same table under different roles) across the orders fact join.
    Spec("join_q7_volume",
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val c = t(s, d, "customer"); val su = t(s, d, "supplier")
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        val pair = Seq("NATION_18", "NATION_19", "NATION_20", "NATION_21")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .where(col("supp_nation").isin(pair: _*) && col("cust_nation").isin(pair: _*) &&
            col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
                 ${msumSql("volume", 4)} AS revenue, count(*) AS n_items
               FROM (
                 SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                        CAST(year(l_shipdate) AS INT) AS l_year,
                        l_extendedprice * (1.0 - l_discount) AS volume
                 FROM lineitem
                   JOIN orders   ON l_orderkey = o_orderkey
                   JOIN supplier ON l_suppkey = s_suppkey
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation n1 ON s_nationkey = n1.n_nationkey
                   JOIN nation n2 ON c_nationkey = n2.n_nationkey
                 WHERE n1.n_name IN ('NATION_18', 'NATION_19', 'NATION_20', 'NATION_21')
                   AND n2.n_name IN ('NATION_18', 'NATION_19', 'NATION_20', 'NATION_21')
                   AND n1.n_name <> n2.n_name) shipping
               GROUP BY supp_nation, cust_nation, l_year
               ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q17 shape (small-quantity revenue): the correlated-scalar-
    // subquery form — each lineitem compared against 0.2× its OWN part's
    // average quantity. Decorrelated the scale-correct way: one aggregate
    // over the fact keyed by partkey, rejoined (what Catalyst's
    // RewriteCorrelatedScalarSubquery does internally). The threshold is
    // exact-sum/count then one multiply — bit-identical across engines.
    Spec("join_q17_smallqty",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part").where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        // Pre-filter the per-part average's input with a broadcast
        // SEMI-join on the selective brand predicate (round 16, guide
        // §3.2): the correlated threshold is per-part (computed from that
        // part's own rows only) and the outer join is inner on the same
        // filtered parts, so restricting avgq to qualifying parts first
        // is equivalence-preserving — the (partkey) aggregate shuffles
        // ~12% of the fact (3 of 25 brands) instead of all of it.
        val avgq = li
          .join(broadcast(p.select(col("p_partkey").as("a_pk"))),
            col("l_partkey") === col("a_pk"), "leftsemi")
          .groupBy(col("l_partkey").as("a_partkey"))
          .agg(((sum("l_quantity") / count(lit(1))) * 0.2).as("small_thresh"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(avgq, col("l_partkey") === col("a_partkey"))
          .where(col("l_quantity") < col("small_thresh"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_small"), msum(col("l_extendedprice")).as("small_revenue"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, count(*) AS n_small,
                 ${msumSql("l_extendedprice")} AS small_revenue
               FROM lineitem
                 JOIN part ON l_partkey = p_partkey
               WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
                 AND l_quantity < (
                   SELECT sum(l_quantity) / count(*) * 0.2
                   FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
               GROUP BY p_brand ORDER BY p_brand""")),

    // TPC-H Q10 shape (returned-item reporting): quarter of returns per
    // customer, top-20 by lost revenue — dims broadcast, one fact-fact
    // shuffle, TakeOrderedAndProject for the limit.
    Spec("join_q10_returns",
      (s, d) => {
        val li = t(s, d, "lineitem").where(col("l_returnflag") === "R")
        val o = t(s, d, "orders").where(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
        val c = t(s, d, "customer"); val n = t(s, d, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
                 ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
               FROM lineitem
                 JOIN orders   ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation   ON c_nationkey = n_nationkey
               WHERE l_returnflag = 'R'
                 AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                 AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
               GROUP BY c_custkey, c_name, c_acctbal, n_name
               ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // TPC-H Q18 shape (large-volume orders): the IN-(group-having)
    // subquery decorrelated into aggregate-then-join — one shuffle on
    // l_orderkey for the aggregate, an orderkey-co-keyed join back to
    // orders (SMJ under AQE), customer dim broadcast. The quantity sum is
    // decimal-exact so the >200 cut is identical on both engines.
    Spec("join_q18_bigorders",
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val big = li.groupBy("l_orderkey")
          .agg(msum(col("l_quantity")).as("total_qty"))
          .where(col("total_qty") > 200)
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("o_date"),
            col("total_qty"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH big AS (
                 SELECT l_orderkey, ${msumSql("l_quantity")} AS total_qty
                 FROM lineitem GROUP BY l_orderkey
                 HAVING ${msumSql("l_quantity")} > 200)
               SELECT c_custkey, c_name, o_orderkey,
                 CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date, total_qty
               FROM big
                 JOIN orders   ON o_orderkey = l_orderkey
                 JOIN customer ON c_custkey = o_custkey
               ORDER BY o_orderkey""")),

    // TPC-H Q21 shape (suppliers who kept the order waiting). "Fault" is
    // l_returnflag = 'R' (this dataset has no commit/receipt dates); the
    // EXISTS requires ANOTHER supplier on the order, the NOT EXISTS
    // requires no OTHER faulty supplier. Round 12: the semi + anti
    // self-join decorrelation (three fact shuffles + two joins) is
    // replaced by the ALGEBRAIC form — the quantifier pair is a
    // per-order cardinality condition: a faulty (order, supplier) pair
    // is blamed iff the order has > 1 distinct suppliers AND exactly 1
    // faulty supplier (which is then necessarily this pair's). Two
    // chained aggregates: (order, supplier) grain with a faulty flag
    // (map-side combine compresses the fact to pair grain BEFORE the
    // shuffle — at 100 TB this is the difference between shuffling the
    // fact three times and once), then order grain computing
    // (n_supp, n_faulty, the unique faulty supplier via min-when), a
    // filter, and a broadcast supplier dim. JobProf: 9 jobs/1.6 s →
    // 4 jobs/0.6 s steady at sf0.1. The oracle keeps the EXISTS/NOT
    // EXISTS text — it documents the quantifier semantics this algebra
    // must reproduce.
    Spec("join_q21_blame",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ps = li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("faulty"))
        val og = ps.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"),
            sum("faulty").as("n_faulty"),
            min(when(col("faulty") === 1, col("l_suppkey")))
              .as("faulty_supp"))
          .where(col("n_supp") > 1 && col("n_faulty") === 1)
        og.join(broadcast(t(s, d, "supplier")),
            col("faulty_supp") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy("s_suppkey")
      },
      Some("""WITH faulty AS (
                SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                WHERE l_returnflag = 'R')
              SELECT s_suppkey, s_name, count(*) AS numwait
              FROM faulty f JOIN supplier ON s_suppkey = f.l_suppkey
              WHERE EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = f.l_orderkey
                    AND l2.l_suppkey <> f.l_suppkey)
                AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = f.l_orderkey
                    AND l3.l_suppkey <> f.l_suppkey
                    AND l3.l_returnflag = 'R')
              GROUP BY s_suppkey, s_name
              ORDER BY s_suppkey""")),

    // TPC-H Q15 shape (top supplier by revenue): the correlated
    // "revenue = (SELECT max(...))" predicate decorrelates to a 1-ROW
    // global aggregate broadcast-cross-joined back onto the same
    // aggregated relation — no per-row subquery, and the revenue
    // partial-agg feeds both branches. Exact decimal revenue (msum)
    // makes the max-equality bit-safe on both engines.
    Spec("join_q15_toprevenue",
      (s, d) => {
        val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .groupBy("l_suppkey")
          .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("total_rev"))
        val mx = rev.agg(max("total_rev").as("max_rev"))
        rev.crossJoin(broadcast(mx))
          .where(col("total_rev") === col("max_rev"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
                 SELECT l_suppkey,
                   ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS total_rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey)
               SELECT s_suppkey, s_name, total_rev
               FROM rev JOIN supplier ON l_suppkey = s_suppkey
               WHERE total_rev = (SELECT max(total_rev) FROM rev)
               ORDER BY s_suppkey""")),

    // TPC-H Q22 shape (above-average customers with no RECENT orders —
    // every customer in this data has SOME order, so the existence
    // check is against a date-filtered orders set): global
    // scalar-average subquery (1-row broadcast) + LEFT-ANTI existence
    // check, grouped by nation (this schema carries no c_phone, so
    // nationkey plays cntrycode). mavg is one IEEE division over an
    // exact decimal sum — bit-identical threshold on both engines, so
    // the > comparison selects identical customer sets.
    Spec("join_q22_idle_rich",
      (s, d) => {
        val cut = lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
        val c = t(s, d, "customer")
        val avgRow = c.where(col("c_acctbal") > 0)
          .agg(mavg(col("c_acctbal")).as("avg_bal"))
        val recent = t(s, d, "orders").where(col("o_orderdate") >= cut)
        c.crossJoin(broadcast(avgRow))
          .where(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"), msum(col("c_acctbal")).as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, count(*) AS numcust,
                 ${msumSql("c_acctbal")} AS totacctbal
               FROM customer
               WHERE c_acctbal > (SELECT ${mavgSql("c_acctbal")}
                                  FROM customer WHERE c_acctbal > 0)
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
               GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join with a right-side-only predicate (pushed below the join —
    // equivalent to an ON-clause extra condition for outer joins), a
    // first aggregate at the JOIN KEY grain (c_custkey — reuses the
    // join's hash partitioning, no second exchange), then a tiny
    // re-aggregation over the distinct counts. count(o_orderkey)
    // counts only matched rows; customers with no qualifying order
    // land in the c_count=0 bucket — the outer-join semantics the
    // histogram exists to surface.
    Spec("join_q13_custdist",
      (s, d) => {
        val o = t(s, d, "orders")
          .where(col("o_orderpriority") =!= "1-URGENT")
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey) t
              GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // TPC-H Q19 shape (disjunctive join predicate): the OR-of-ANDs
    // post-join filter shares one equi-key (p_partkey = l_partkey), so
    // Catalyst plans a single hash join and — via constraint
    // propagation — derives per-side residual filters (p_brand IN
    // (...) AND p_size <= 30 to the part scan, l_quantity <= 40 to the
    // lineitem scan) that reach the parquet PushedFilters. The
    // anti-pattern this query exists to reject is a UNION of three
    // joins: three fact scans instead of one.
    Spec("join_q19_disjunctive",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part")
        val cond = col("p_partkey") === col("l_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 40)))
        li.join(p, cond)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, count(*) AS n,
                 ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
               FROM lineitem JOIN part ON p_partkey = l_partkey
               WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                      AND l_quantity BETWEEN 1 AND 20)
                  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                      AND l_quantity BETWEEN 10 AND 30)
                  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                      AND l_quantity BETWEEN 20 AND 40)
               GROUP BY p_brand ORDER BY p_brand""")),

    // TPC-H Q4 shape (order-priority checking): EXISTS decorrelates to a
    // LEFT-SEMI join with an equi key (orderkey) plus a NON-EQUI residual
    // (this schema has no l_commitdate/l_receiptdate, so "late line item"
    // is l_shipdate > o_orderdate — same correlated-comparison shape).
    // Catalyst plans one hash semi-join with the residual evaluated on
    // matches; each order is counted at most once no matter how many
    // qualifying line items it has — the semantics EXISTS exists for, and
    // exactly what a fact-side duplicate-producing inner join would get
    // wrong. Date range prunes the orders scan (PushedFilters).
    Spec("join_q4_priority",
      (s, d) => {
        val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00"))
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        o.join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND l_shipdate > o_orderdate)
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // TPC-H Q14 shape (promotion effect): conditional-aggregate ratio over
    // one month of lineitem ⋈ part. Both branches are EXACT decimal sums
    // (msum) so the single IEEE division is over bit-identical operands on
    // both engines; the CASE routes revenue into the promo branch without
    // a second scan or join (the anti-pattern is two joins UNION'd). part
    // broadcasts; the month filter reaches the lineitem scan.
    Spec("join_q14_promo",
      (s, d) => {
        val lo = lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
        t(s, d, "lineitem")
          .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .agg(
            msum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .otherwise(lit(0.0)), 4).as("promo_revenue"),
            msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("total_revenue"))
          .select(
            round(col("promo_revenue") * lit(100.0) / col("total_revenue"), 6)
              .as("promo_pct"),
            col("promo_revenue"), col("total_revenue"))
      },
      Some(s"""SELECT round(promo_revenue * 100.0 / total_revenue, 6) AS promo_pct,
                 promo_revenue, total_revenue
               FROM (
                 SELECT
                   ${msumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 4)} AS promo_revenue,
                   ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS total_revenue
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00') t""")),

    // TPC-H Q5 shape (local-supplier volume): the classic 6-table chain —
    // customer ⋈ orders ⋈ lineitem ⋈ supplier with the "local" twist that
    // the supplier must sit in the CUSTOMER's nation (c_nationkey =
    // s_nationkey rides on the supplier equi-join, not as a post-filter).
    // nation and region broadcast; the r_name filter prunes nations before
    // the fact join, and the order-year filter reaches the orders scan.
    // At 100 TB the only shuffles are the two fact-fact hash joins on
    // orderkey — the dimension chain is exchange-free.
    Spec("join_q5_local_supplier",
      (s, d) => {
        val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some(s"""SELECT n_name,
                 ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
               FROM customer
               JOIN orders   ON c_custkey  = o_custkey
               JOIN lineitem ON o_orderkey = l_orderkey
               JOIN supplier ON l_suppkey  = s_suppkey
                            AND c_nationkey = s_nationkey
               JOIN nation   ON s_nationkey = n_nationkey
               JOIN region   ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
               GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // TPC-H Q8 shape (national market share): what fraction of AMERICA's
    // PROMO-part import volume was supplied from NATION_7, by order year.
    // nation joins TWICE under different roles (customer's nation routes
    // through region to the AMERICA filter; supplier's nation labels the
    // share) — the role split is two broadcast copies, not a self-join
    // shuffle. Numerator and denominator are one pass over the same rows
    // (CASE-routed exact decimal sums), so the share is a single IEEE
    // division of bit-identical operands. part is pre-filtered to PROMO
    // before broadcasting — the fact scan shrinks at the first join.
    Spec("join_q8_market_share",
      (s, d) => {
        val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
        val custNation = t(s, d, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
        val suppNation = t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").where(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "AMERICA")
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .select(year(col("o_orderdate")).as("o_year"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
            col("supp_nation"))
          .groupBy("o_year")
          .agg(
            msum(when(col("supp_nation") === "NATION_7", col("volume"))
              .otherwise(lit(0.0)), 4).as("nation_volume"),
            msum(col("volume"), 4).as("total_volume"))
          .select(col("o_year"),
            round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"),
            col("nation_volume"), col("total_volume"))
          .orderBy("o_year")
      },
      Some(s"""SELECT o_year, round(nation_volume / total_volume, 6) AS mkt_share,
                 nation_volume, total_volume
               FROM (
                 SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   ${msumSql("CASE WHEN sn.n_name = 'NATION_7' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 4)} AS nation_volume,
                   ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS total_volume
                 FROM lineitem
                 JOIN part     ON l_partkey = p_partkey
                 JOIN orders   ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation cn ON c_nationkey = cn.n_nationkey
                 JOIN region   ON cn.n_regionkey = r_regionkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation sn ON s_nationkey = sn.n_nationkey
                 WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
                   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
                 GROUP BY CAST(year(o_orderdate) AS INT)) t
               ORDER BY o_year""")),

    // TPC-H Q9 shape (product-type profit by nation and year), minus the
    // partsupp cost term the testdata cannot express (no partsupp table —
    // recorded in SURVEY round notes): profit = revenue on parts matching
    // a name token, attributed to the SUPPLIER's nation. part is filtered
    // by the LIKE before its broadcast; supplier and nation broadcast; the
    // two fact joins (lineitem ⋈ orders on orderkey) are the only
    // shuffles. Grouped on (nation, year) — a cardinality-bounded key
    // (25 × 7) regardless of fact size.
    Spec("join_q9_profit",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").where(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("profit"))
        .orderBy(asc("nation"), desc("o_year")),
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                 ${msumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS profit
               FROM lineitem
               JOIN part     ON l_partkey = p_partkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation   ON s_nationkey = n_nationkey
               JOIN orders   ON l_orderkey = o_orderkey
               WHERE p_name LIKE '%red%'
               GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))
  )
}
