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
              FROM marked ORDER BY user_id, event_id""")),

    // Peak concurrency per day — the SWEEP-LINE algorithm as a query:
    // each user-day session becomes a +1 open / −1 close point, a
    // running integer sum over the (time, delta) order is the live
    // concurrency, and the per-day max is the capacity-planning number.
    // Close sorts before open at an equal microsecond (delta ASC) so the
    // tie rule is explicit and identical on both engines; all arithmetic
    // is exact integers. Scale: the window is per-day (bounded
    // partitions), points are 2× sessions — linear.
    Spec("evt_concurrency",
      (s, d) => {
        val sess = t(s, d, "events")
          .groupBy(col("user_id"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        val pts = sess.select(col("day"), unix_micros(col("lo")).as("t"),
            lit(1L).as("delta"))
          .unionByName(sess.select(col("day"),
            (unix_micros(col("hi")) + 1L).as("t"), lit(-1L).as("delta")))
        val w = Window.partitionBy("day").orderBy("t", "delta")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pts.withColumn("conc", sum("delta").over(w))
          .groupBy("day").agg(max("conc").as("peak_concurrency"))
          .orderBy("day")
      },
      Some("""WITH sess AS (
                SELECT user_id,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  min(ts) AS lo, max(ts) AS hi
                FROM events GROUP BY 1, 2),
              pts AS (
                SELECT day, epoch_us(lo) AS t, CAST(1 AS BIGINT) AS delta FROM sess
                UNION ALL
                SELECT day, epoch_us(hi) + 1 AS t, CAST(-1 AS BIGINT) FROM sess),
              run AS (
                SELECT day, t,
                  CAST(sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS conc
                FROM pts)
              SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
              FROM run GROUP BY day ORDER BY day""")),

    // Share-of-total report — each (flag, status) revenue as a fraction
    // of the grand total. BOTH aggregation levels stay exact decimal
    // (the group sum AND the windowed grand total — a double grand total
    // would re-introduce association-order drift across 6 merge orders);
    // the only IEEE ops are the two final casts and one division.
    Spec("win_ratio_to_report",
      (s, d) => {
        val g = t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_extendedprice").cast("decimal(30,2)")).as("rev_dec"))
        g.select(col("l_returnflag"), col("l_linestatus"),
            round(col("rev_dec"), 2).cast("double").as("rev"),
            round(col("rev_dec").cast("double") /
              sum(col("rev_dec")).over(Window.partitionBy()).cast("double"), 6)
              .as("share"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""WITH g AS (
                SELECT l_returnflag, l_linestatus,
                  sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS rev_dec
                FROM lineitem GROUP BY 1, 2)
              SELECT l_returnflag, l_linestatus,
                CAST(round(rev_dec, 2) AS DOUBLE) AS rev,
                round(CAST(rev_dec AS DOUBLE) /
                      CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS share
              FROM g ORDER BY l_returnflag, l_linestatus""")),

    // Bounce rate per day — single-event user-days over total user-days,
    // the engagement-quality counterpart of the stickiness row. One hash
    // aggregate to session grain, one to day grain, a single division.
    Spec("evt_bounce_rate",
      (s, d) => {
        val sess = t(s, d, "events")
          .groupBy(col("user_id"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(count(lit(1)).as("n_ev"))
        sess.groupBy("day")
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"),
            round(sum(when(col("n_ev") === 1, 1L).otherwise(0L)).cast("double") /
              count(lit(1)), 6).as("bounce_rate"))
          .orderBy("day")
      },
      Some("""WITH sess AS (
                SELECT user_id,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  count(*) AS n_ev
                FROM events GROUP BY 1, 2)
              SELECT day, count(*) AS n_sessions,
                CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bounce,
                round(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 6) AS bounce_rate
              FROM sess GROUP BY day ORDER BY day""")),

    // Day-over-day percentage change per event type — the dashboard
    // companion of the slope row: integer daily counts, one lag, ONE
    // division (first row NULL on both engines). O(1) window state.
    Spec("win_pct_change",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily
          .select(col("event_type"), col("day"), col("n"),
            round((col("n").cast("double") -
              lag("n", 1).over(w).cast("double")) /
              lag("n", 1).over(w).cast("double"), 6).as("pct_change"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
                  count(*) AS n
                FROM events GROUP BY 1, 2)
              SELECT event_type, day, n,
                round((CAST(n AS DOUBLE) - CAST(lag(n) OVER w AS DOUBLE)) /
                      CAST(lag(n) OVER w AS DOUBLE), 6) AS pct_change
              FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
              ORDER BY event_type, day""")),

    // DAU / trailing-7-day-WAU stickiness ratio — the engagement KPI.
    // WAU-per-day reuses evt_wau_rolling's covering-window explode (a
    // user active on day d is "covered" for days d..d+6), which is the
    // scalable distinct-over-range shape: no per-day re-scan, one
    // explode + two hash aggregates, distinct at (user, day) grain first
    // so the explode is bounded by active-user-days × 7.
    Spec("evt_stickiness",
      (s, d) => {
        val ud = t(s, d, "events")
          .select(col("user_id"),
            unix_date(to_date(col("ts"))).cast("long").as("day"))
          .distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("n_dau"))
        val wau = ud
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + lit(6L))).as("wday"))
          .groupBy(col("wday").as("day"))
          .agg(countDistinct(col("user_id")).as("n_wau"))
        dau.join(wau, "day")
          .select(col("day"), col("n_dau"), col("n_wau"),
            round(col("n_dau").cast("double") / col("n_wau").cast("double"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH ud AS (
                SELECT DISTINCT user_id,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
                FROM events),
              dau AS (SELECT day, count(*) AS n_dau FROM ud GROUP BY day),
              cover AS (
                SELECT user_id, unnest(generate_series(day, day + 6)) AS wday
                FROM ud),
              wau AS (
                SELECT wday AS day, count(DISTINCT user_id) AS n_wau
                FROM cover GROUP BY wday)
              SELECT d.day, d.n_dau, w.n_wau,
                round(CAST(d.n_dau AS DOUBLE) / CAST(w.n_wau AS DOUBLE), 6)
                  AS stickiness
              FROM dau d JOIN wau w ON d.day = w.day
              ORDER BY d.day""")),

    // Top-20 three-step event paths — sequence mining lite ("what do
    // users actually do?"). Two leads over the per-user time order give
    // every consecutive triple in one window pass; the path-grain count
    // is a plain hash aggregate and the top-20 a TakeOrderedAndProject
    // (count DESC, path ASC tiebreak so the cut line is deterministic).
    // Scale: the window is per-user (no global sort); paths cardinality
    // is |event_types|³ — tiny.
    Spec("evt_path_analysis",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("e2", lead("event_type", 1).over(w))
          .withColumn("e3", lead("event_type", 2).over(w))
          .where(col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("path")).limit(20)
      },
      Some("""WITH seq AS (
                SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT event_type || '>' || e2 || '>' || e3 AS path,
                count(*) AS n
              FROM seq WHERE e3 IS NOT NULL
              GROUP BY 1 ORDER BY n DESC, path LIMIT 20""")),

    // SELECT * EXCEPT — the wide-table projection sugar (Spark 4 spells
    // it EXCEPT, DuckDB EXCLUDE; the 100 TB relevance is that the
    // resolved projection still drives parquet column pruning exactly as
    // an explicit column list would).
    Spec("sql_star_except",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT * EXCEPT (o_orderpriority, o_orderstatus)
                 FROM orders ORDER BY o_orderkey""")
      },
      Some("""SELECT * EXCLUDE (o_orderpriority, o_orderstatus)
              FROM orders ORDER BY o_orderkey""")),

    // Gaps-and-islands: longest consecutive-active-day streak per user —
    // the classic engagement metric, and the canonical island pattern
    // (day − row_number() is constant within each run). Day is exact
    // integer epoch-day arithmetic (`div`, not date_trunc) so both
    // engines bucket identically. Scale: the (user_id, day) distinct is
    // a two-phase hash aggregate, the window and both downstream
    // aggregates all key on user_id — one logical partitioning carried
    // through; no per-island data movement beyond it. Streak length is
    // bounded by days-in-corpus, never by corpus size.
    Spec("evt_streak",
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        days.withColumn("grp", col("day") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("max_streak"),
            count(lit(1)).as("n_streaks"),
            (max("len") - min("len")).as("streak_spread"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
              isl AS (
                SELECT user_id, day,
                  day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS grp
                FROM days),
              runs AS (
                SELECT user_id, grp, count(*) AS len
                FROM isl GROUP BY user_id, grp)
              SELECT user_id, max(len) AS max_streak,
                     count(*) AS n_streaks,
                     max(len) - min(len) AS streak_spread
              FROM runs GROUP BY user_id ORDER BY user_id""")),

    // Conversion-latency distribution — the funnel twin at DELTA grain:
    // click→purchase lag percentiles across converted users. Percentiles
    // are the SQL-standard discrete definition stated EXPLICITLY in both
    // engines (smallest lag with cume_dist ≥ p) so no engine-native
    // quantile interpolation — whose last-ulp float arithmetic differs
    // across engines at µs magnitudes — ever runs; every output is either
    // an exact integer or a single division of exact integers (avg: both
    // engines sum ≤2^53-bounded integers exactly, then divide once).
    // Scale: both aggregates key on user_id; the cume-dist picks run over
    // the VALUE-COMPRESSED lag histogram (cume_dist is constant within
    // tied values, so the per-row window collapses to the histogram
    // cumulation losslessly), cumulated by ScalableCumulate's bucketed
    // two-pass — no single-task window at any grain. cd is the same
    // cum/n double division cume_dist performs, so the ≥p picks are
    // bit-compatible with the oracle's cume_dist; avg is an exact
    // integer sum with one final division (both engines ≤2^53-exact).
    Spec("evt_time_to_convert",
      (s, d) => {
        val e = t(s, d, "events")
        val per = e.groupBy("user_id")
          .agg(min(when(col("event_type") === "click", col("ts"))).as("c_ts"))
        val pa = e.join(per, "user_id")
          .where(col("event_type") === "purchase" && col("ts") >= col("c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        val lag = per.join(pa, "user_id")
          .select((unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
            .as("lag_us"))
        val h = lag.groupBy("lag_us").agg(count(lit(1)).as("cnt"))
        ScalableCumulate.cumSum(h, col("lag_us"), ascending = true,
            Seq(col("lag_us")), Seq(ScalableCumulate.Cum("cum", col("cnt"))),
            totals = Map("cum" -> "n"))
          .withColumn("cd", col("cum").cast("double") / col("n"))
          .agg(sum("cnt").as("n_converted"),
            min(when(col("cd") >= 0.5, col("lag_us"))).as("p50_us"),
            min(when(col("cd") >= 0.9, col("lag_us"))).as("p90_us"),
            min("lag_us").as("min_us"),
            max("lag_us").as("max_us"),
            round(sum(col("lag_us") * col("cnt")).cast("double") /
              sum("cnt"), 6).as("avg_us"))
      },
      Some("""WITH per AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts
                FROM events GROUP BY user_id),
              pa AS (
                SELECT e.user_id, min(e.ts) AS p_ts
                FROM events e JOIN per ON e.user_id = per.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= per.c_ts
                GROUP BY e.user_id),
              lag AS (
                SELECT epoch_us(p_ts) - epoch_us(c_ts) AS lag_us
                FROM per JOIN pa ON per.user_id = pa.user_id),
              cd AS (
                SELECT lag_us,
                       cume_dist() OVER (ORDER BY lag_us) AS cd FROM lag)
              SELECT count(*) AS n_converted,
                     min(CASE WHEN cd >= 0.5 THEN lag_us END) AS p50_us,
                     min(CASE WHEN cd >= 0.9 THEN lag_us END) AS p90_us,
                     min(lag_us) AS min_us,
                     max(lag_us) AS max_us,
                     round(avg(lag_us), 6) AS avg_us
              FROM cd""")),

    // Session-grain engagement summary — the aggregate layer over
    // win_sessionize's island construction (identical gap rule, 5 min on
    // exact integer microseconds): per user, how many sessions, how long,
    // how dense. Every output is an exact integer or a single division
    // of exact integers. Scale: the brk/grp windows, the session
    // aggregate, and the user rollup all key on user_id — one shuffle
    // carried through three stages; session count is bounded by events
    // per user, never corpus-wide.
    Spec("evt_session_stats",
      (s, d) => {
        val gapUs = 300000000L
        val e = t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        val w = Window.partitionBy("user_id").orderBy("tus")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("brk",
            when(lag("tus", 1).over(w).isNull ||
              col("tus") - lag("tus", 1).over(w) >= gapUs, 1).otherwise(0))
          .withColumn("grp", sum("brk").over(run))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("n"), (max("tus") - min("tus")).as("dur_us"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n").as("n_events"),
            max("n").as("max_len"),
            sum("dur_us").as("total_dur_us"),
            round(sum("n").cast("double") / count(lit(1)).cast("double"), 6)
              .as("avg_len"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
              dif AS (
                SELECT user_id, tus,
                  CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                         OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) >= 300000000
                       THEN 1 ELSE 0 END AS brk
                FROM e),
              g AS (
                SELECT user_id, tus,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM dif),
              sess AS (
                SELECT user_id, grp, count(*) AS n,
                       max(tus) - min(tus) AS dur_us
                FROM g GROUP BY user_id, grp)
              SELECT user_id, count(*) AS n_sessions,
                     CAST(sum(n) AS BIGINT) AS n_events,
                     CAST(max(n) AS BIGINT) AS max_len,
                     CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
                     round(CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                       AS avg_len
              FROM sess GROUP BY user_id ORDER BY user_id""")),

    // Statistical mode per group, deterministic: count + window top-1 with
    // an explicit value tie-break (engine-native mode() functions break
    // ties arbitrarily — ungradeable and irreproducible). Count is a
    // two-phase hash aggregate; the window partitions by group.
    Spec("agg_mode",
      (s, d) => {
        val cnt = t(s, d, "lineitem").groupBy("l_returnflag", "l_quantity")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(desc("n"), asc("l_quantity"))
        cnt.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH cnt AS (
                SELECT l_returnflag, l_quantity, count(*) AS n
                FROM lineitem GROUP BY 1, 2),
              r AS (
                SELECT *, row_number() OVER (PARTITION BY l_returnflag
                  ORDER BY n DESC, l_quantity) AS rn
                FROM cnt)
              SELECT l_returnflag, l_quantity AS mode_qty, n
              FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    // posexplode (ordinal-preserving UDTF): first five tokens of each
    // document with their positions. Spark emits (pos, tok) natively;
    // DuckDB reconstructs ordinals via a constant series + 1-based list
    // index (no WITH ORDINALITY support).
    Spec("fn_posexplode",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)))
        .withColumnRenamed("col", "tok")
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, i AS pos, str_split(text, ' ')[i + 1] AS tok
              FROM documents
                CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) s
              WHERE i < least(5, len(str_split(text, ' ')))
              ORDER BY doc_id, pos""")),

    // Brute-force cosine top-5 through the FUSED native expression
    // (functions/CosineSimExpr): dot + both norms in one codegen'd array
    // pass, vs. the three-traversal HOF chain of sim_cosine_topk. Same
    // broadcast-probe ∥ scan shape (zero shuffle), same top-k window, and
    // bit-identical numerics — the oracle is sim_cosine_topk's.
    Spec("sim_cosine_fused",
      (s, d) => {
        graft.functions.CosineSimExpr.register(s)
        val v = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val p = v.where(col("vec_id") < 5)
          .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
        val w = Window.partitionBy("p_id").orderBy(desc("cosine"), asc("vec_id"))
        v.join(broadcast(p), col("vec_id") =!= col("p_id"))
          .select(col("p_id"), col("vec_id"),
            round(expr("cosine_sim(p_emb, embedding)"), 6).as("cosine"))
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
          .select("p_id", "rnk", "vec_id", "cosine")
          .orderBy("p_id", "rnk")
      },
      Some("""WITH emb2 AS (
                SELECT vec_id, embedding,
                  sqrt(list_reduce(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
                FROM embeddings),
              cosv AS (
                SELECT p.vec_id AS p_id, v.vec_id,
                  round(list_reduce(list_transform(list_zip(p.embedding, v.embedding),
                      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)
                    / (p.nrm * v.nrm), 6) AS cosine
                FROM emb2 p JOIN emb2 v ON v.vec_id <> p.vec_id
                WHERE p.vec_id < 5)
              SELECT p_id, rnk, vec_id, cosine FROM (
                SELECT p_id, vec_id, cosine,
                  row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, vec_id) AS rnk
                FROM cosv) WHERE rnk <= 5
              ORDER BY p_id, rnk""")),

    // Edit-distance near-dup: Levenshtein over 40-char prefixes of
    // consecutive-id document pairs — the character-level companion to the
    // token-set (Jaccard), MinHash, SimHash, and embedding dedup variants.
    // Pairing is an equi-join on doc_id+1 (co-keyed shuffle, no n² blow-up
    // — at scale the pair generator is any bounded candidate source, e.g.
    // LSH buckets). Distances are exact integers on both engines.
    Spec("dedup_editdist",
      (s, d) => {
        val doc = t(s, d, "documents")
        val a = doc.select(col("doc_id"), substring(col("text"), 1, 40).as("p1"))
        val b = doc.select((col("doc_id") - 1).as("b_id"),
          substring(col("text"), 1, 40).as("p2"))
        a.join(b, col("doc_id") === col("b_id"))
          .select(col("doc_id"), levenshtein(col("p1"), col("p2")).as("dist"))
          .where(col("dist") < 25)
          .orderBy("doc_id")
      },
      Some("""SELECT a.doc_id, levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
              WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) < 25
              ORDER BY a.doc_id""")),

    // Boolean aggregates (every/any): two-phase hash agg like any other.
    Spec("agg_bool",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.05).as("any_big_discount"),
          bool_and(col("l_tax") < 0.09).as("all_low_tax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     bool_and(l_quantity > 0) AS all_positive,
                     bool_or(l_discount > 0.05) AS any_big_discount,
                     bool_and(l_tax < 0.09) AS all_low_tax
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT (top-2
    // cheapest lineitems per part): Catalyst decorrelates the lateral
    // into a ranked-window join — the scale shape — while the query TEXT
    // stays the natural per-row form. Identical SQL runs on both engines.
    // Tie-safety: duplicate (orderkey, linenumber) rows can tie at the
    // LIMIT boundary, but tied rows are value-identical, so either choice
    // hashes the same.
    Spec("join_lateral_topk",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT p.p_partkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice
                 FROM part p,
                 LATERAL (SELECT l_orderkey, l_linenumber, l_extendedprice
                          FROM lineitem
                          WHERE l_partkey = p.p_partkey
                          ORDER BY l_extendedprice, l_orderkey, l_linenumber LIMIT 2) l
                 WHERE p.p_partkey < 50
                 ORDER BY p.p_partkey, l.l_extendedprice, l.l_orderkey, l.l_linenumber""")
      },
      Some("""SELECT p.p_partkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice
              FROM part p,
              LATERAL (SELECT l_orderkey, l_linenumber, l_extendedprice
                       FROM lineitem
                       WHERE l_partkey = p.p_partkey
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber LIMIT 2) l
              WHERE p.p_partkey < 50
              ORDER BY p.p_partkey, l.l_extendedprice, l.l_orderkey, l.l_linenumber""")),

    // Recursive CTE (Spark 4.1 WITH RECURSIVE): generate the continuous
    // week calendar spanning the event log, then left-join weekly counts —
    // recursion builds the bounded dimension (depth = weeks in range, not
    // data volume), the fact side stays a hash aggregate. Epoch-day week
    // arithmetic keeps both engines on identical buckets.
    Spec("sql_recursive_cte",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""WITH RECURSIVE b AS (
                   SELECT CAST(floor(unix_date(to_date(min(ts)))/7) AS BIGINT) AS lo,
                          CAST(floor(unix_date(to_date(max(ts)))/7) AS BIGINT) AS hi
                   FROM events),
                 weeks(wk) AS (
                   SELECT lo FROM b
                   UNION ALL
                   SELECT wk + 1 FROM weeks, b WHERE wk < hi)
                 SELECT w.wk, count(e.user_id) AS n_events
                 FROM weeks w LEFT JOIN
                   (SELECT CAST(floor(unix_date(to_date(ts))/7) AS BIGINT) AS wk, user_id
                    FROM events) e
                   USING (wk)
                 GROUP BY w.wk ORDER BY w.wk""")
      },
      Some("""WITH RECURSIVE b AS (
                SELECT CAST(floor(date_diff('day', DATE '1970-01-01', CAST(min(ts) AS DATE))/7) AS BIGINT) AS lo,
                       CAST(floor(date_diff('day', DATE '1970-01-01', CAST(max(ts) AS DATE))/7) AS BIGINT) AS hi
                FROM events),
              weeks(wk) AS (
                SELECT lo FROM b
                UNION ALL
                SELECT wk + 1 FROM weeks, b WHERE wk < hi)
              SELECT w.wk, count(e.user_id) AS n_events
              FROM weeks w LEFT JOIN
                (SELECT CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))/7) AS BIGINT) AS wk, user_id
                 FROM events) e
                USING (wk)
              GROUP BY w.wk ORDER BY w.wk""")),

    // SQL pipe syntax (Spark 4 `|>`) — the linear query-authoring surface:
    // each operator consumes the previous result top-to-bottom, no inside-
    // out reading. Pure PARSER sugar: Catalyst receives the identical
    // logical plan as the desugared form (filter → two-phase hash agg with
    // the decimal money-sum → sort), so the 100 TB story is its twin's.
    // DuckDB has no pipe dialect; the oracle IS the desugared SQL, which
    // doubles as documentation of the desugaring.
    Spec("sql_pipe_syntax",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(s"""FROM lineitem
                  |> WHERE l_shipdate <= DATE '1998-09-02'
                  |> AGGREGATE ${msumSql("l_extendedprice")} AS revenue,
                       CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                         AS sum_qty,
                       count(*) AS n
                     GROUP BY l_returnflag, l_linestatus
                  |> ORDER BY l_returnflag, l_linestatus""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
                 ${msumSql("l_extendedprice")} AS revenue,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                   AS sum_qty,
                 count(*) AS n
               FROM lineitem
               WHERE l_shipdate <= DATE '1998-09-02'
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // GROUP BY ALL / ORDER BY ALL sugar (Spark 4 ≡ DuckDB): group on
    // every non-aggregate select item, order on every output column
    // left-to-right. Resolved at ANALYSIS time to the explicit form — the
    // oracle states that desugared form, so the row is also a regression
    // tripwire on the resolution rule itself. Same two-phase hash
    // aggregate as any groupBy; ORDER BY ALL's total order over all
    // columns is what the determinism contract wants anyway.
    Spec("agg_group_by_all",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(s"""SELECT l_returnflag, l_linestatus,
                    ${msumSql("l_extendedprice * (1 - l_discount)", 4)}
                      AS disc_rev,
                    count(*) AS n
                  FROM lineitem
                  GROUP BY ALL
                  ORDER BY ALL""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
                 ${msumSql("l_extendedprice * (1 - l_discount)", 4)}
                   AS disc_rev,
                 count(*) AS n
               FROM lineitem
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus, disc_rev, n""")),

    // ORDER BY ALL standalone (no grouping): a total presentation order
    // over every output column without naming them — exactly the
    // determinism contract every oracle query hand-writes. Desugared at
    // analysis to the explicit column list the oracle states.
    Spec("sort_order_by_all",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal
                 FROM customer WHERE c_acctbal > 9000
                 ORDER BY ALL""")
      },
      Some("""SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal
              FROM customer WHERE c_acctbal > 9000
              ORDER BY c_mktsegment, c_nationkey, c_custkey, c_acctbal""")),

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
        val chunks = chunkDocs(kept.select("doc_id", "text"))
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
