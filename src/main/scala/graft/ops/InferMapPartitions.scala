package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's literal scoring mechanism: an opaque model broadcast to
  * executors, scored inside `mapPartitions` so the model is realized once
  * per partition, not once per row — no shuffle anywhere in the scoring
  * stage (the "embarrassingly parallel" property).
  *
  * The model here is the deterministic centroid matrix (10 × 64). Only the
  * model — never data — is collected to the driver; at 100 TB the scored
  * Dataset still streams partition-by-partition with a broadcast of a few
  * KB, exactly like the reference's CNN-weights broadcast.
  */
object InferMapPartitions {
  import Tables._

  final case class Emb(vec_id: Long, embedding: Seq[Float], label: Int)

  def scoreMapPartitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // "Model fit" (tiny: labels × dim) → driver → broadcast.
    val model: Array[(Int, Array[Double])] =
      Inference.centroids(s, d).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toArray
        .map { case (lbl, rows) => lbl -> rows.sortBy(_._2).map(_._3) }
        .sortBy(_._1)
    val bc = s.sparkContext.broadcast(model)

    t(s, d, "embeddings").as[Emb].mapPartitions { it =>
      val m = bc.value // realized once per partition, like the reference's model load
      it.map { e =>
        val x = e.embedding.toArray
        var bestLabel = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < m.length) {
          val c = m(i)._2
          var acc = 0.0; var j = 0
          while (j < c.length) { acc += x(j).toDouble * c(j); j += 1 }
          // strict > keeps the LOWEST label on ties (m sorted by label)
          if (acc > bestScore) { bestScore = acc; bestLabel = m(i)._1 }
          i += 1
        }
        (e.vec_id, e.label, bestLabel)
      }
    }.toDF("vec_id", "label", "pred")
  }

  val all: Seq[Spec] = Seq(
    // Same predictions as the SQL-shaped infer_argmax (scores differ only
    // in sub-rounding float details, far from any argmax tie).
    Spec("infer_mapp_argmax",
      (s, d) => scoreMapPartitions(s, d).orderBy("vec_id"),
      Some(s"""WITH ${Inference.predsCtesSql}
               SELECT vec_id, label, pred FROM preds ORDER BY vec_id"""))
  )
}
