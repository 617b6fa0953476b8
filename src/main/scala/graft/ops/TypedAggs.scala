package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §4's typed-UDAF
  * seam) — the Dataset-native custom aggregate, complementing the
  * `TypedImperativeAggregate` sketches (KLL / Misra-Gries) on the
  * Expression side.
  *
  * Determinism design: the buffer is a pair of LONGS — quantity·price
  * scaled ×100 (prices have 2 decimals; the scaled product is exactly
  * integral in IEEE, max ~5e8 per row, sum ≪ 2^63) and the integral
  * quantity sum. Long addition is associative, so any partial-merge order
  * gives the same buffer; the finish step is a fixed two-op IEEE sequence
  * `(num/100.0)/den` mirrored literally in the oracle SQL.
  */
object TypedAggs {
  import Tables._

  /** Quantity-weighted mean price per group — exact until one final division. */
  object WeightedMeanAgg
      extends Aggregator[(String, Double, Double), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (String, Double, Double)): (Long, Long) =
      (b._1 + math.round(a._2 * a._3 * 100), b._2 + math.round(a._2))
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) Double.NaN else (b._1.toDouble / 100.0) / b._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val all: Seq[Spec] = Seq(
    Spec("agg_typed_weighted",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
          .as[(String, Double, Double)]
          .groupByKey(_._1)
          .agg(WeightedMeanAgg.toColumn.name("wavg_price"))
          .toDF("l_returnflag", "wavg_price")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
                (CAST(sum(CAST(l_quantity * l_extendedprice * 100 AS BIGINT)) AS DOUBLE) / 100.0)
                  / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wavg_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // KeyValueGroupedDataset.mapGroups — the typed per-group escape hatch
    // (arbitrary JVM logic over a whole group's iterator), completing the
    // typed surface next to Aggregator above. Used here for a per-language
    // corpus profile incl. an argmax (longest doc, ties to lowest id).
    // Everything computed is ORDER-INDEPENDENT (count/sum/max + explicit
    // tie rule), because mapGroups gives no intra-group order guarantee —
    // that discipline, not the API, is what makes the result exact.
    // Scale honesty: mapGroups materializes each group through an
    // iterator with NO partial aggregation and no codegen — the right
    // tool only when per-group logic genuinely can't be expressed as
    // aggregates/windows (here it could; this query exists to pin the
    // API's semantics and cost, the infer_mapp_argmax role). The shuffle
    // is one hash exchange on the group key, same as the SQL twin.
    Spec("typed_mapgroups",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select(col("lang"), col("n_chars"), col("doc_id"))
          .as[(String, Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (lang, rows) =>
            var n = 0L; var total = 0L; var mx = Long.MinValue; var arg = Long.MaxValue
            rows.foreach { case (_, chars, id) =>
              n += 1; total += chars
              if (chars > mx || (chars == mx && id < arg)) { mx = chars; arg = id }
            }
            (lang, n, total, mx, arg)
          }
          .toDF("lang", "n_docs", "total_chars", "max_chars", "longest_doc_id")
          .orderBy("lang")
      },
      Some("""WITH ranked AS (
                SELECT lang, n_chars, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk
                FROM documents)
              SELECT d.lang, count(*) AS n_docs,
                CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
                max(d.n_chars) AS max_chars,
                min(r.doc_id) AS longest_doc_id
              FROM documents d
                JOIN (SELECT lang, doc_id FROM ranked WHERE rk = 1) r
                  ON d.lang = r.lang
              GROUP BY d.lang ORDER BY d.lang"""))
  )
}
