package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 verdict #3: a static tripwire for the HUGEINT bug class.
  *
  * DuckDB types `sum(<integer>)` as HUGEINT (INT128) — including inside
  * window frames — while Spark emits BIGINT; tools/check.py is
  * dtype-strict, so an oracle carrying an unwrapped integer sum
  * hash-fails even when every value matches (the r5 `pack_sequences` red
  * was exactly this). The repo convention is to wrap every integer sum in
  * `CAST(... AS BIGINT)` (or emit an explicitly double/decimal sum). This
  * spec scans every declared oracle at diff time, so the next new query
  * cannot reintroduce the class; check.py only catches it after a full
  * verify cycle.
  *
  * Heuristic, by design (the verdict sanctions regex + allowlist): a
  * `sum(` occurrence is suspicious unless (a) it is directly wrapped in
  * `CAST(`/`round(` — the two sanctioned wrap shapes — or (b) its
  * argument is manifestly non-integer (`AS DOUBLE`/`AS DECIMAL`/a
  * double-producing function), or (c) it is allowlisted below with the
  * reason the raw sum is double-typed.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Sanctioned raw sums: (query name, argument substring, reason).
    * Two safe classes: the sum is DOUBLE-typed on both engines (double
    * input column), or it is an INTERMEDIATE the query only consumes in
    * downstream arithmetic / as a grouping key — the HUGEINT class never
    * reaches an output column, which is the only place check.py's dtype
    * gate looks. Every entry was green under the dtype-strict r6 checker.
    */
  private val doubleSumAllow: Seq[(String, String, String)] = Seq(
    ("agg_filtered", "ELSE 0.0 END",
      "CASE carries a double branch → DOUBLE sum on both engines"),
    ("dedup_simhash", "THEN 1 ELSE -1",
      "bit-vote sum consumed by a sign comparison, never emitted"),
    ("eval_per_class", "THEN 1 ELSE 0",
      "hit count consumed by a CAST(... AS DOUBLE)/count ratio"),
    ("fn_map", "etype = 'click'",
      "pivot cell consumed by downstream map construction, never raw"),
    ("stream_session", "sum(brk)",
      "running break-sum is the session GROUP BY key, never emitted"),
    ("stream_session_timers", "sum(brk)",
      "running break-sum is the session GROUP BY key, never emitted"),
    ("win_sessionize", "sum(brk)",
      "running break-sum is the session GROUP BY key, never emitted"),
    ("evt_session_stats", "sum(brk)",
      "running break-sum is the session GROUP BY key, never emitted"),
    ("evt_session_cooccurrence", "sum(brk)",
      "running break-sum is the session join key, never emitted"),
    ("win_since_last_purchase", "event_type = 'purchase'",
      "running purchase-count is the island PARTITION BY key, never emitted"),
    ("text_repetition", "sum(cnt)",
      "bigram total consumed by a double ratio, never emitted"),
    ("agg_weighted_median", "sum(w)",
      "w is an exact DECIMAL(30,2) weight from the counts CTE — a decimal " +
        "window sum, not an integer sum, and it is only compared, never " +
        "emitted"),
    ("agg_weighted_percentile", "sum(w)",
      "same decimal weight histogram as agg_weighted_median — cum is " +
        "only compared against wtot thresholds, never emitted"),
    ("agg_abc_class", "sum(rev)",
      "rev is DECIMAL(30,4) from the rev CTE — decimal window sums, " +
        "only cross-multiplied in the class predicate or re-aggregated " +
        "under round()"),
    ("agg_mad", "sum(cnt)",
      "histogram cumulation windows — only compared in the median pick " +
        "condition, never emitted"),
    ("agg_cvar", "sum(cnt)",
      "histogram cumulation windows — only compared in the p95 pick " +
        "condition, never emitted"),
    ("agg_cvar", "sum(x.x)",
      "decimal tail sum, emitted only under round(CAST(... AS DOUBLE))"),
    ("agg_winsorized_mean", "sum(cnt)",
      "histogram cumulation windows — only compared in the pick " +
        "conditions, never emitted"),
    ("agg_winsorized_mean", "sum(greatest",
      "decimal clamped sum, emitted only under round(CAST(... AS DOUBLE))"),
    ("agg_winsorized_mean", "sum(x.x)",
      "decimal raw sum, emitted only under round(CAST(... AS DOUBLE))"))

  /** Extract suspicious sum() occurrences: returns the argument text of
    * each flagged call.
    */
  private[graft] def uncastIntSums(name: String, sql: String): Seq[String] = {
    val res = scala.collection.mutable.Buffer.empty[String]
    val re = "(?i)(?<![a-zA-Z_])sum\\s*\\(".r
    for (m <- re.findAllMatchIn(sql)) {
      // balanced-paren argument
      var depth = 1
      var j = m.end
      while (depth > 0 && j < sql.length) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      val arg = sql.substring(m.end, j - 1).trim
      val pre = sql.substring(math.max(0, m.start - 24), m.start).toUpperCase
      val wrapped = pre.matches("(?s).*(CAST|ROUND)\\s*\\(\\s*$")
      val argU = arg.toUpperCase
      val manifestlyNonInt =
        argU.contains("AS DOUBLE") || argU.contains("AS DECIMAL") ||
          argU.contains("POW(") || argU.contains("ROUND(") ||
          // l_quantity is the one DOUBLE fixture column summed raw —
          // sum(l_quantity) is DOUBLE on both engines
          argU.contains("L_QUANTITY")
      val allowed = doubleSumAllow.exists { case (q, frag, _) =>
        q == name && (arg.contains(frag) || s"sum($arg)".contains(frag))
      }
      if (!wrapped && !manifestlyNonInt && !allowed) res += arg
    }
    res.toSeq
  }

  test("no declared oracle carries an uncast integer sum") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        uncastIntSums(name, sql).map(arg => s"$name: sum($arg)")
    }
    assert(offenders.isEmpty,
      s"\nuncast sum() shapes (DuckDB types these HUGEINT — wrap in " +
        s"CAST(... AS BIGINT) or allowlist with a reason):\n  " +
        offenders.mkString("\n  "))
  }

  test("the tripwire actually fires on the pack_sequences bug shape") {
    val bad =
      """SELECT shard, sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id) AS cum FROM docs"""
    assert(uncastIntSums("injected", bad).nonEmpty)
    val good =
      """SELECT shard, CAST(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum FROM docs"""
    assert(uncastIntSums("injected", good).isEmpty)
    // plain aggregate shape too, not just windows
    assert(uncastIntSums("injected", "SELECT sum(n) FROM t").nonEmpty)
    assert(uncastIntSums("injected",
      "SELECT CAST(sum(n) AS BIGINT) FROM t").isEmpty)
  }
}
