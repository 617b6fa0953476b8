package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/product-analytics operators over `events` + `lineitem` — the
  * query shapes a behavioural-analytics user of the engine runs daily
  * (funnels, cohort retention, histograms, wide→long reshaping, binary
  * encodings). All oracle-checked; every output column is either integral,
  * exact-decimal-derived, or a deterministic single IEEE op.
  *
  * Scale notes per query inline; none shuffles more than the keyed
  * aggregates/joins require, and nothing materializes per-user state
  * beyond hash-aggregate groups.
  */
object Analytics {
  import Tables._

  /** Overlapping fixed-window chunking of (doc_id, text) rows — shared by
    * the text_chunk Spec and edge-case tests. greatest() guards the
    * empty-document edge (sequence(0,-1) would emit a DESCENDING [0,-1]);
    * the start<len filter then drops the empty doc's chunk 0, mirroring
    * the oracle's filter exactly.
    */
  def chunkDocs(doc: DataFrame, size: Int = 128, stride: Int = 96): DataFrame =
    doc.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), greatest(lit(0L),
          floor((length(col("text")) - 1) / stride).cast("long")))).as("chunk_id"))
      .where(col("chunk_id") * stride < length(col("text")))
      .select(col("doc_id"), col("chunk_id"),
        col("text").substr(col("chunk_id") * stride + 1, lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .orderBy("doc_id", "chunk_id")

  val all: Seq[Spec] = Seq(
    // Conversion funnel: for each user, first click, then first purchase
    // at-or-after that click; one summary row. Two keyed hash aggregates +
    // one keyed join — every stage is partial-aggregated map-side, the
    // user_id shuffle is the only exchange and AQE plans the join. Lag sum
    // is exact integer microseconds (no float drift).
    Spec("evt_funnel",
      (s, d) => {
        val e = t(s, d, "events")
        val per = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "click", col("ts"))).as("c_ts"))
        val pa = e.join(per, "user_id")
          .where(col("event_type") === "purchase" && col("ts") >= col("c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        per.join(pa, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_users"),
            count(col("c_ts")).as("n_clicked"),
            count(col("p_ts")).as("n_converted"),
            sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
              .cast("long").as("total_lag_us"))
      },
      Some("""WITH per AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts
                FROM events GROUP BY user_id),
              pa AS (
                SELECT e.user_id, min(e.ts) AS p_ts
                FROM events e JOIN per ON e.user_id = per.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= per.c_ts
                GROUP BY e.user_id)
              SELECT count(*) AS n_users, count(c_ts) AS n_clicked,
                     count(p_ts) AS n_converted,
                     CAST(sum(epoch_us(p_ts) - epoch_us(c_ts)) AS BIGINT) AS total_lag_us
              FROM per LEFT JOIN pa ON per.user_id = pa.user_id""")),

    // Windowed 3-step funnel — evt_funnel upgraded to how funnels are
    // actually specified: strictly ordered view → click → purchase with a
    // 48-hour CONVERSION WINDOW on each step (an unbounded funnel counts
    // a purchase weeks later as "converted"). Each step is one
    // conditional-min aggregate joined back to the prior step's
    // timestamp; per-step lag sums stay exact integer µs. Scale: three
    // user-keyed hash aggregates + broadcast-friendly joins — no windows,
    // no per-user state beyond the group row.
    Spec("evt_funnel_windowed",
      (s, d) => {
        val e = t(s, d, "events")
        val v = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
        val c = e.join(v, "user_id")
          .where(col("event_type") === "click" && col("ts") >= col("v_ts") &&
            col("ts") <= col("v_ts") + expr("INTERVAL 48 HOUR"))
          .groupBy("user_id").agg(min("ts").as("c_ts"))
        val p = e.join(c, "user_id")
          .where(col("event_type") === "purchase" && col("ts") >= col("c_ts") &&
            col("ts") <= col("c_ts") + expr("INTERVAL 48 HOUR"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_users"), count(col("v_ts")).as("n_viewed"),
            count(col("c_ts")).as("n_clicked"),
            count(col("p_ts")).as("n_purchased"),
            sum(unix_micros(col("c_ts")) - unix_micros(col("v_ts")))
              .cast("long").as("total_vc_us"),
            sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
              .cast("long").as("total_cp_us"))
      },
      Some("""WITH v AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
                FROM events GROUP BY user_id),
              c AS (
                SELECT e.user_id, min(e.ts) AS c_ts
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts >= v.v_ts
                  AND e.ts <= v.v_ts + INTERVAL 48 HOUR
                GROUP BY e.user_id),
              p AS (
                SELECT e.user_id, min(e.ts) AS p_ts
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
                  AND e.ts <= c.c_ts + INTERVAL 48 HOUR
                GROUP BY e.user_id)
              SELECT count(*) AS n_users, count(v_ts) AS n_viewed,
                count(c_ts) AS n_clicked, count(p_ts) AS n_purchased,
                CAST(sum(epoch_us(c_ts) - epoch_us(v_ts)) AS BIGINT) AS total_vc_us,
                CAST(sum(epoch_us(p_ts) - epoch_us(c_ts)) AS BIGINT) AS total_cp_us
              FROM v LEFT JOIN c ON v.user_id = c.user_id
                     LEFT JOIN p ON v.user_id = p.user_id""")),

    // Weekly cohort retention: cohort = a user's first active epoch-week;
    // cells count distinct users active at each week offset. Epoch-day
    // arithmetic (not date_trunc) so both engines bucket identically.
    // Two user_id-keyed aggregates + a join, then a (cohort, offset)
    // aggregate — all hash-partial; distinct-count expands to the standard
    // two-phase plan.
    Spec("evt_cohort_retention",
      (s, d) => {
        val ew = t(s, d, "events").select(col("user_id"),
          floor(unix_date(to_date(col("ts"))) / 7).cast("long").as("wk"))
        val cohort = ew.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        ew.join(cohort, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
          .agg(countDistinct("user_id").as("n_active"))
          .orderBy("cohort_wk", "offset_wk")
      },
      Some("""WITH ew AS (
                SELECT user_id,
                       CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
                FROM events),
              c AS (SELECT user_id, min(wk) AS cohort_wk FROM ew GROUP BY user_id)
              SELECT c.cohort_wk, ew.wk - c.cohort_wk AS offset_wk,
                     count(DISTINCT ew.user_id) AS n_active
              FROM ew JOIN c ON ew.user_id = c.user_id
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Rolling weekly-active users (WAU): for each observed day, the
    // distinct users with a purchase in the trailing 7 days. A
    // distinct-over-range window cannot be expressed as a window function
    // (count(DISTINCT) is not frame-able), and a day⋈day range join is
    // quadratic in days — the scale shape is the COVERING-WINDOW EXPLODE:
    // reduce to the distinct (user, day) grain first (the dominant,
    // corpus-shrinking aggregate), replicate each pair to the ≤7 window
    // days it covers, equi-join the bounded observed-day list (broadcast —
    // calendar-sized by definition), and finish with one two-phase
    // distinct aggregate keyed on day. Work is |active pairs| × 7, linear
    // at any corpus size. Days are epoch-day longs for cross-engine parity.
    Spec("evt_wau_rolling",
      (s, d) => {
        val ud = t(s, d, "events")
          .where(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .distinct()
        val days = ud.select("day").distinct().withColumnRenamed("day", "wday")
        ud.select(col("user_id"),
            explode(sequence(col("day"), col("day") + lit(6L))).as("wday"))
          .join(broadcast(days), "wday")
          .groupBy("wday")
          .agg(countDistinct("user_id").as("wau"))
          .select(col("wday").as("day"), col("wau"))
          .orderBy("day")
      },
      Some("""WITH ud AS (
                SELECT DISTINCT user_id,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
                FROM events WHERE event_type = 'purchase'),
              days AS (SELECT DISTINCT day FROM ud),
              cover AS (
                SELECT user_id, unnest(generate_series(day, day + 6)) AS wday
                FROM ud)
              SELECT c.wday AS day, count(DISTINCT c.user_id) AS wau
              FROM cover c JOIN days dd ON c.wday = dd.day
              GROUP BY 1 ORDER BY 1""")),

    // RFM segmentation (recency / frequency / monetary) — the classic
    // customer-value analysis, shaped for scale: one user-keyed hash
    // aggregate over purchases (partial map-side), a 1-ROW broadcast scalar
    // for "today" (the corpus max day — the standard decorrelation, same as
    // join_q15), and a quartile assignment. Recency is exact epoch-day
    // integer arithmetic; monetary is an exact decimal sum (msum); the
    // ntile ties are broken by (monetary DESC, user_id) — a total order, so
    // segments are deterministic. The user grain is unbounded, so the
    // quartile comes from ScalableCumulate's bucketed two-pass row number
    // (ntileOf reproduces SQL ntile arithmetically from rank + n) — no
    // single-task sort of the user relation anywhere in the plan.
    Spec("evt_rfm",
      (s, d) => {
        val p = t(s, d, "events")
          .where(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_date(to_date(col("ts"))).cast("long").as("day"), col("value"))
        val u = p.groupBy("user_id")
          .agg(max("day").as("last_day"), count(lit(1)).as("frequency"),
            msum(col("value")).as("monetary"))
        val today = p.agg(max("day").as("max_day"))
        val base = u.crossJoin(broadcast(today))
          .select(col("user_id"), (col("max_day") - col("last_day")).as("recency_days"),
            col("frequency"), col("monetary"))
        val (rn, n) = ScalableCumulate.rowNumber(base, col("monetary"),
          ascending = false, Seq(desc("monetary"), asc("user_id")), "__rn")
        rn.withColumn("segment", ScalableCumulate.ntileOf(col("__rn"), n, 4))
          .drop("__rn")
          .orderBy("user_id")
      },
      Some(s"""WITH p AS (
                 SELECT user_id,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                   "value"
                 FROM events WHERE event_type = 'purchase'),
               u AS (
                 SELECT user_id, max(day) AS last_day, count(*) AS frequency,
                   ${msumSql("value")} AS monetary
                 FROM p GROUP BY user_id),
               m AS (SELECT max(day) AS max_day FROM p)
               SELECT user_id, m.max_day - last_day AS recency_days, frequency,
                 monetary,
                 CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
                   AS segment
               FROM u CROSS JOIN m ORDER BY user_id""")),

    // Last-touch attribution: each purchase is attributed to the user's
    // most recent PRECEDING non-purchase event (type + microsecond lag).
    // One window over the per-user event stream — `last(..., ignoreNulls)`
    // over ROWS UNBOUNDED PRECEDING..1 PRECEDING is a running carry, O(n)
    // per partition, one user_id shuffle total; (ts, event_id) ordering is
    // a total order so the carried event is deterministic. The lag is exact
    // integer microseconds. First-touch is the same query with first().
    Spec("evt_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val nonP = when(col("event_type") =!= "purchase", col("event_type"))
        val nonTs = when(col("event_type") =!= "purchase", unix_micros(col("ts")))
        t(s, d, "events")
          .withColumn("attr_type", last(nonP, ignoreNulls = true).over(w))
          .withColumn("lag_us",
            unix_micros(col("ts")) - last(nonTs, ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select("event_id", "user_id", "attr_type", "lag_us")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, attr_type, lag_us FROM (
                SELECT event_id, user_id, event_type,
                  last_value(CASE WHEN event_type <> 'purchase'
                    THEN event_type END IGNORE NULLS) OVER w AS attr_type,
                  epoch_us(ts) - last_value(CASE WHEN event_type <> 'purchase'
                    THEN epoch_us(ts) END IGNORE NULLS) OVER w AS lag_us
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
              WHERE event_type = 'purchase' ORDER BY event_id""")),

    // Fixed-width value histogram: floor-binning keeps both engines on the
    // same bucket; min/max are exact on identical doubles, the sum is
    // decimal-exact. One hash aggregate — the 100 TB shape.
    Spec("evt_histogram",
      (s, d) => t(s, d, "events")
        .groupBy(floor(col("value") / 16).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_v"),
          min("value").as("min_v"), max("value").as("max_v"))
        .orderBy("bin"),
      Some(s"""SELECT CAST(floor("value" / 16) AS BIGINT) AS bin, count(*) AS n,
                 ${msumSql("value")} AS sum_v,
                 min("value") AS min_v, max("value") AS max_v
               FROM events GROUP BY bin ORDER BY bin""")),

    // Wide→long reshape via the DataFrame unpivot (melt) operator; oracle
    // states the same relation as a UNION ALL. Unpivot is a per-row
    // flatMap — no shuffle beyond the feeding aggregate.
    Spec("agg_unpivot",
      (s, d) => {
        val base = t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(msum(col("l_quantity")).as("qty"),
            msum(col("l_extendedprice")).as("price"))
        base.unpivot(Array(col("l_returnflag")),
            Array(col("qty"), col("price")), "metric", "value")
          .orderBy("l_returnflag", "metric")
      },
      Some(s"""WITH b AS (
                 SELECT l_returnflag, ${msumSql("l_quantity")} AS qty,
                        ${msumSql("l_extendedprice")} AS price
                 FROM lineitem GROUP BY l_returnflag)
               SELECT l_returnflag, 'qty' AS metric, qty AS value FROM b
               UNION ALL
               SELECT l_returnflag, 'price' AS metric, price AS value FROM b
               ORDER BY l_returnflag, metric""")),

    // Binary encodings: hex + base64 of UTF-8 bytes, plus a decode
    // round-trip proof column. Pure per-row codegen'd expressions.
    Spec("fn_encode",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"),
          hex(col("c_name")).as("name_hex"),
          base64(col("c_name").cast("binary")).as("name_b64"),
          (decode(unbase64(base64(col("c_name").cast("binary"))), "UTF-8")
            === col("c_name")).as("roundtrip_ok"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, hex(c_name) AS name_hex,
                     to_base64(encode(c_name)) AS name_b64,
                     decode(from_base64(to_base64(encode(c_name)))) = c_name AS roundtrip_ok
              FROM customer ORDER BY c_custkey""")),

    // Fixed-window document chunking with overlap (size 128, stride 96) —
    // the standard training-data prep step before tokenization. Spark side
    // derives the chunk count PER ROW (sequence to floor((len-1)/stride)):
    // a pure per-row explode, no shuffle, no corpus-wide constant — the
    // 100 TB shape. The oracle uses a generous constant series + filter
    // only because DuckDB's generate_series needs constant bounds.
    Spec("text_chunk",
      (s, d) => chunkDocs(t(s, d, "documents")),
      // series bound 255 supports docs to 24 576 chars — 40× the longest
      // fixture text at any sf; ChunkOracleBoundSpec asserts the headroom
      Some("""SELECT doc_id, i AS chunk_id, substr(text, CAST(i * 96 + 1 AS INT), 128) AS chunk,
                     length(substr(text, CAST(i * 96 + 1 AS INT), 128)) AS chunk_len
              FROM documents
                CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS i) s
              WHERE i * 96 < length(text)
              ORDER BY doc_id, chunk_id""")),

    // Sub-document (paragraph-grain) exact dedup — the CCNet-style line
    // dedup step: documents chunk into overlapping 128-char windows (the
    // same chunkDocs relation text_chunk declares), then exact dedup runs
    // at CHUNK grain — sha2 hash groupBy, two-phase hash aggregate, one
    // shuffle at chunk cardinality. At 100 TB this is how boilerplate
    // (headers, footers, license blocks) is stripped when whole-document
    // dedup can't see it; output is one row per distinct chunk content
    // with its multiplicity and canonical location.
    Spec("dedup_chunk_exact",
      (s, d) => chunkDocs(t(s, d, "documents"))
        .groupBy(sha2(col("chunk"), 256).as("chunk_hash"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("chunk_hash"),
      Some("""WITH ch AS (
                SELECT doc_id, substr(text, CAST(i * 96 + 1 AS INT), 128) AS chunk
                FROM documents
                  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS i) s
                WHERE i * 96 < length(text))
              SELECT sha256(chunk) AS chunk_hash, count(*) AS n_copies,
                count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
              FROM ch GROUP BY sha256(chunk) ORDER BY chunk_hash""")),

    // Event-type transition matrix (first-order Markov estimate): adjacent
    // event pairs per user stream via lead() — one user_id shuffle, O(n)
    // per partition — then a (from, to) hash aggregate. The row-conditional
    // probability divides by the per-from total through a window sum of
    // exact integers; the division is the only float op (identical
    // operands → bit-identical, unrounded).
    Spec("evt_transition_matrix",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wf = Window.partitionBy("from_type")
        pairs
          .withColumn("p", col("n").cast("double") /
            sum(col("n")).over(wf).cast("double"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH pairs AS (
                SELECT event_type AS from_type,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS to_type
                FROM events),
              cnt AS (
                SELECT from_type, to_type, count(*) AS n FROM pairs
                WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
              SELECT from_type, to_type, n,
                CAST(n AS DOUBLE) /
                  CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
              FROM cnt ORDER BY from_type, to_type""")),

    // Volume-anomaly detection (z-score vs a trailing window) — the
    // monitoring staple over event streams. Daily counts per event type
    // (one hash aggregate), then a 7-row trailing window carries the exact
    // integer sums Σn and Σn² from which mean/std/z finish as a fixed IEEE
    // dag — the same exact-partials discipline as agg_corr_covar, so z is
    // bit-identical with no rounding. Degenerate windows (k<2 or zero
    // variance) yield NULL via an identical guard on both engines. Windows
    // are per event type: |types| partitions of |days| rows — tiny at any
    // corpus size once the day-grain aggregate has run.
    Spec("evt_anomaly_zscore",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, 0)
        daily
          .withColumn("k", count(lit(1)).over(w).cast("double"))
          .withColumn("sx", sum(col("n")).over(w).cast("double"))
          .withColumn("sxx", sum(col("n") * col("n")).over(w).cast("double"))
          // divisor null-guarded: ANSI mode errors on k-1 = 0 (a 1-row
          // window), and null propagates to the same NULL z the CASE
          // branch produces on the oracle side
          .withColumn("vars",
            (col("sxx") - col("sx") * col("sx") / col("k")) /
              when(col("k") > 1, col("k") - 1))
          .select(col("event_type"), col("day"), col("n"),
            when(col("k") > 1 && col("vars") > 0,
              (col("n") - col("sx") / col("k")) / sqrt(col("vars")))
              .as("z"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  count(*) AS n
                FROM events GROUP BY 1, 2),
              win AS (
                SELECT event_type, day, n,
                  CAST(count(*) OVER w AS DOUBLE) AS k,
                  CAST(sum(n) OVER w AS DOUBLE) AS sx,
                  CAST(sum(n * n) OVER w AS DOUBLE) AS sxx
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
              SELECT event_type, day, n,
                CASE WHEN k > 1 AND (sxx - sx * sx / k) / (k - 1) > 0
                  THEN (n - sx / k) / sqrt((sxx - sx * sx / k) / (k - 1))
                END AS z
              FROM win ORDER BY event_type, day""")),

    // Rolling 14-day OLS trend slope per event type — the zscore row's
    // direction-of-drift sibling (is volume ramping up or decaying?).
    // Strictly stronger determinism than zscore: x (epoch day) and y
    // (count) are BIGINTs, so ALL five window sufficient statistics
    // (k, Σx, Σy, Σxy, Σx²) stay exact integers, the slope numerator and
    // denominator are computed in exact integer arithmetic, and the ONLY
    // float op is the final division — bit-identical by construction with
    // no rounding convention needed (rounded anyway for display parity).
    // Scale: one hash-agg to day grain, then an O(1)-state window per
    // event_type.
    Spec("win_rolling_slope",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-13, 0)
        daily
          .withColumn("k", count(lit(1)).over(w))
          .withColumn("sx", sum(col("day")).over(w))
          .withColumn("sy", sum(col("n")).over(w))
          .withColumn("sxy", sum(col("day") * col("n")).over(w))
          .withColumn("sxx", sum(col("day") * col("day")).over(w))
          .select(col("event_type"), col("day"), col("n"),
            when(col("k") * col("sxx") - col("sx") * col("sx") =!= 0L,
              round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
              .as("slope"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  count(*) AS n
                FROM events GROUP BY 1, 2),
              win AS (
                SELECT event_type, day, n,
                  CAST(count(*) OVER w AS BIGINT) AS k,
                  CAST(sum(day) OVER w AS BIGINT) AS sx,
                  CAST(sum(n) OVER w AS BIGINT) AS sy,
                  CAST(sum(day * n) OVER w AS BIGINT) AS sxy,
                  CAST(sum(day * day) OVER w AS BIGINT) AS sxx
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
              SELECT event_type, day, n,
                CASE WHEN k * sxx - sx * sx <> 0
                  THEN round(CAST(k * sxy - sx * sy AS DOUBLE) /
                             CAST(k * sxx - sx * sx AS DOUBLE), 6) END AS slope
              FROM win ORDER BY event_type, day""")),

    // Rolling 7-day MEDIAN of daily counts — the robust smoother a
    // volume monitor pairs with the mean-based zscore row. Spark has no
    // median window function; the Spark-first re-expression is
    // collect_list over the frame → array_sort → middle element, emitted
    // only for FULL 7-row frames so the middle is exact (odd count, no
    // interpolation — both engines agree by construction; DuckDB's
    // native windowed median reduces to the same element). Per-row cost
    // is O(7 log 7) on a bounded frame — constant — and the window is
    // per-event-type, no global sort.
    Spec("win_rolling_median",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, 0)
        daily
          .withColumn("k", count(lit(1)).over(w))
          .withColumn("arr", array_sort(collect_list(col("n")).over(w)))
          .select(col("event_type"), col("day"), col("n"),
            when(col("k") === 7,
              element_at(col("arr"), 4).cast("double")).as("med7"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  count(*) AS n
                FROM events GROUP BY 1, 2),
              win AS (
                SELECT event_type, day, n,
                  count(*) OVER w AS k,
                  CAST(median(n) OVER w AS DOUBLE) AS med
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
              SELECT event_type, day, n,
                CASE WHEN k = 7 THEN med END AS med7
              FROM win ORDER BY event_type, day""")),

    // Exponentially-weighted moving average over each user's last 8
    // events — the classic low-latency smoother (monitoring, trading,
    // rate estimation) that plain rolling means lag behind. α = 1/2, so
    // every weight 2⁻ⁱ is an EXACT binary float and each term x·2⁻ⁱ is
    // one IEEE multiply; numerator and denominator are then SEQUENTIAL
    // left-to-right folds over the frame-ordered (newest-first) list —
    // the same order on both engines — so the result is bit-identical
    // with no scaling tricks (the rolling-median collect-then-fold idiom
    // applied to a weighted mean). Frame order is (ts, event_id): unique,
    // hence deterministic. Per-row cost is a bounded 8-element fold; one
    // shuffle on the user key, no global sort before the final ORDER BY.
    Spec("win_ewma",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-7, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"), col("ts"))
          .withColumn("arr", reverse(collect_list(col("value")).over(w)))
          .withColumn("num", aggregate(
            transform(col("arr"), (x, i) => x * pow(lit(0.5), i.cast("double"))),
            lit(0.0), (a, x) => a + x))
          .withColumn("den", aggregate(
            transform(col("arr"), (x, i) => pow(lit(0.5), i.cast("double"))),
            lit(0.0), (a, x) => a + x))
          .select(col("user_id"), col("event_id"),
            round(col("num") / col("den"), 6).as("ewma8"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH framed AS (
                SELECT user_id, event_id,
                  list_reverse(list(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) AS arr
                FROM events)
              SELECT user_id, event_id,
                round(
                  list_reduce(list_transform(arr,
                    (x, i) -> x * power(0.5, i - 1)), (a, b) -> a + b) /
                  list_reduce(list_transform(arr,
                    (x, i) -> power(0.5, i - 1)), (a, b) -> a + b), 6)
                  AS ewma8
              FROM framed ORDER BY user_id, event_id""")),

    // Cumulative DISTINCT count over a stream order — "how many distinct
    // event types has this user seen so far?" A naive per-row distinct
    // re-scan is O(n²); the scalable shape is the FIRST-OCCURRENCE trick:
    // one window marks each (user, type)'s first row, a second running
    // sum counts the marks — two window passes, O(1) state each, exact.
    Spec("win_running_distinct",
      (s, d) => {
        val wFirst = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("first_seen",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .select(col("user_id"), col("event_id"),
            sum("first_seen").over(wRun).as("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH marked AS (
                SELECT user_id, event_id, ts, event_type,
                  CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
                FROM events)
              SELECT user_id, event_id,
                CAST(sum(first_seen) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS n_types_seen
              FROM marked ORDER BY user_id, event_id"""))
  )
}
