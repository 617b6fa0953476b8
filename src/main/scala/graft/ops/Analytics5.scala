package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics, third slice (split from Analytics.scala — round 10):
  * subquery/window SQL surfaces and the pipeline_e2e capstone (which
  * reuses Analytics.chunkDocs for its chunking stage).
  */
object Analytics5 {
  import Tables._

  val all: Seq[Spec] = Seq(
    // Correlated EXISTS / NOT EXISTS — the SQL existence-test surface.
    // Catalyst decorrelates both predicates at ANALYSIS time into a
    // left-semi and a left-anti hash join on o_custkey (RewritePredicate
    // Subquery), so despite the row-at-a-time reading the physical plan
    // is two key-partitioned joins — the same 100 TB shape as
    // join_semi/join_anti, never a per-row subquery execution. Identical
    // SQL runs on both engines.
    Spec("sql_exists_subquery",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c_custkey, c_name, c_mktsegment
                 FROM customer c
                 WHERE EXISTS (
                     SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 300000)
                   AND NOT EXISTS (
                     SELECT 1 FROM orders o2
                     WHERE o2.o_custkey = c.c_custkey
                       AND o2.o_orderstatus = 'P')
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
              FROM customer c
              WHERE EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
                AND NOT EXISTS (
                  SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'P')
              ORDER BY c_custkey""")),

    // IN / NOT IN subqueries — the membership twin of the EXISTS row with
    // a DIFFERENT physical story: IN decorrelates to a left-semi join,
    // but NOT IN compiles to Spark's null-aware anti join (three-valued
    // logic: one NULL in the subquery would empty the result, so the
    // operator must track null presence — a broadcast hash join in
    // null-aware mode, not a plain anti). o_custkey is non-null here, so
    // both engines agree on the set semantics while the plan still
    // exercises the null-aware machinery. Identical SQL on both engines.
    Spec("sql_in_subquery",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c_custkey, c_name
                 FROM customer
                 WHERE c_custkey IN (
                     SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
                   AND c_custkey NOT IN (
                     SELECT o_custkey FROM orders
                     WHERE o_orderstatus = 'F' AND o_totalprice < 20000)
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name
              FROM customer
              WHERE c_custkey IN (
                  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
                AND c_custkey NOT IN (
                  SELECT o_custkey FROM orders
                  WHERE o_orderstatus = 'F' AND o_totalprice < 20000)
              ORDER BY c_custkey""")),

    // Named WINDOW clause — one window definition shared by several
    // functions (the SQL-standard way to keep a multi-function ranking
    // query to ONE shuffle+sort; repeating inline OVER specs invites
    // accidental divergence and, in naive engines, repeated sorts).
    // Catalyst resolves all three functions into a single Window node
    // over one (o_custkey)-partitioned sort. count/min/max over the
    // running frame avoid the HUGEINT sum class entirely.
    Spec("sql_named_window",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT o_custkey, o_orderkey,
                   row_number() OVER w AS rn,
                   count(*) OVER w AS n_so_far,
                   max(o_totalprice) OVER w AS max_so_far
                 FROM orders
                 WINDOW w AS (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey)
                 ORDER BY o_custkey, rn""")
      },
      Some("""SELECT o_custkey, o_orderkey,
                row_number() OVER w AS rn,
                count(*) OVER w AS n_so_far,
                max(o_totalprice) OVER w AS max_so_far
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)
              ORDER BY o_custkey, rn""")),

    // DISTINCT ON — "latest order per customer", the row-per-key sugar
    // DuckDB/Postgres users reach for daily. Spark has no DISTINCT ON;
    // the Spark-first re-expression is the row_number()=1 window (one
    // shuffle+sort per key, and at 100 TB WindowGroupLimit pushes the
    // rank-1 filter below the shuffle so only each partition's best rows
    // move). Ties broken deterministically by o_orderkey DESC on both
    // sides.
    Spec("sql_distinct_on",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_orderdate")
          .orderBy("o_custkey")
      },
      Some("""SELECT * FROM (
                SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
                FROM orders
                ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC)
              ORDER BY o_custkey""")),

    // QUALIFY — filter on a window function without a subquery (DuckDB /
    // Snowflake sugar; top-2 orders per customer by price). Spark lacks
    // the keyword, so the Spark side is the desugared subquery-filter —
    // which is exactly what QUALIFY compiles to — and Catalyst's
    // WindowGroupLimit again keeps only each group's top rows below the
    // shuffle. Same desugaring lesson as sql_pipe_syntax: sugar is
    // text-level, the plan is identical.
    Spec("sql_qualify",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
                   SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
                   FROM orders)
                 WHERE rk <= 2
                 ORDER BY o_custkey, rk""")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders
              QUALIFY rk <= 2
              ORDER BY o_custkey, rk""")),

    // Inline VALUES relation — the zero-IO dimension join (tier mapping
    // authored in the query text). Both engines treat it as a constant
    // local relation; Spark folds it before planning so the join
    // broadcast is free. The SQL is identical modulo the FROM-clause
    // VALUES spelling.
    Spec("sql_values_inline",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT t.tier, count(*) AS n,
                   count(DISTINCT n_nationkey) AS n_nations
                 FROM nation
                 JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'mid'),
                              (3, 'high'), (4, 'high')) AS t(rk, tier)
                   ON n_regionkey = t.rk
                 GROUP BY t.tier ORDER BY t.tier""")
      },
      Some("""SELECT t.tier, count(*) AS n,
                count(DISTINCT n_nationkey) AS n_nations
              FROM nation
              JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'mid'),
                           (3, 'high'), (4, 'high')) t(rk, tier)
                ON n_regionkey = t.rk
              GROUP BY t.tier ORDER BY t.tier""")),

    // ANSI-safe casting: try_cast returns NULL on malformed input instead
    // of failing the job — the semantics a 100 TB dirty-text pipeline
    // needs (one bad row must not kill a stage). Valid digits extracted
    // from c_name succeed; the mktsegment word fails to NULL on both
    // engines.
    Spec("fn_try_cast",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"),
          expr("try_cast(substr(c_name, 10) AS BIGINT)").as("name_num"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("seg_num"),
          expr("try_cast(concat('2024-01-', lpad(CAST(c_custkey % 28 + 1 AS STRING), 2, '0')) AS DATE)")
            .cast("string").as("as_date"),
          expr("try_cast(c_mktsegment AS DATE)").cast("string").as("bad_date"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     TRY_CAST(substr(c_name, 10) AS BIGINT) AS name_num,
                     TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
                     CAST(TRY_CAST(concat('2024-01-', lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0')) AS DATE) AS VARCHAR) AS as_date,
                     CAST(TRY_CAST(c_mktsegment AS DATE) AS VARCHAR) AS bad_date
              FROM customer ORDER BY c_custkey""")),

    // Conditional counting: count_if / FILTER — partial-aggregated like
    // any count, no extra pass over the data.
    Spec("agg_count_if",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(count_if(col("l_discount") > 0.05).as("n_discounted"),
          count_if(col("l_returnflag") === "R").as("n_returned"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
                     count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
                     count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
                     count(*) AS n
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // CAPSTONE composite: the training-data pipeline end to end in ONE
    // declared query — exact dedup (sha256 hash-groupBy, keep min doc_id)
    // → quality filter (length + token-count floor) → overlapping chunking
    // (chunkDocs) → whitespace tokenization → per-language corpus stats.
    // Every stage is the scale shape its standalone query established:
    // hash-group dedup shuffles digests not documents, the filter is a
    // scan predicate, chunk+tokenize are per-row explodes, and the final
    // rollup is a two-phase hash aggregate. One query a reference user
    // would actually run nightly.
    Spec("pipeline_e2e",
      (s, d) => {
        val docs = t(s, d, "documents")
        val canonical = docs
          .groupBy(sha2(col("text"), 256).as("h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val kept = docs.join(canonical, "doc_id")
          .where(length(col("text")) >= 100 &&
            size(split(col("text"), " ")) >= 20)
        val chunks = Analytics.chunkDocs(kept.select("doc_id", "text"))
        chunks.join(kept.select("doc_id", "lang"), "doc_id")
          .groupBy("lang")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(size(split(col("chunk"), " "))).cast("long").as("n_tokens"))
          .orderBy("lang")
      },
      Some("""WITH canonical AS (
                SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
              kept AS (
                SELECT d.doc_id, d.text, d.lang
                FROM documents d JOIN canonical USING (doc_id)
                WHERE length(d.text) >= 100 AND len(str_split(d.text, ' ')) >= 20),
              chunks AS (
                SELECT doc_id, lang, substr(text, CAST(i * 96 + 1 AS INT), 128) AS chunk
                FROM kept CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS i) s
                WHERE i * 96 < length(text))
              SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
                     CAST(sum(len(str_split(chunk, ' '))) AS BIGINT) AS n_tokens
              FROM chunks GROUP BY lang ORDER BY lang"""))
  )
}
