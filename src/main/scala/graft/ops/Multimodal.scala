package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (BASELINE.json north star: "multimodal
  * columns"; reference shape: image bytes fetched per worker and decoded
  * inside the scoring partition — [pub: scoring notebooks], SURVEY.md §1.1).
  *
  * Media are opaque `BinaryType` payloads + a typed metadata struct —
  * the schema a 100 TB corpus would use (parquet binary column + metadata,
  * or `binaryFile` source for raw files; see MultimodalSpec for the
  * binaryFile demonstration). No image libs exist in this container, so
  * DECODE IS A DETERMINISTIC STUB (bytes → normalized float "pixels");
  * everything around it — schema, partition-parallel execution shape,
  * batch-per-partition decode amortization, downstream feature extraction
  * — is real Spark and tested.
  *
  * Pipeline stages mirror the reference: ingest(bytes+meta) → decode →
  * resize(pool) → feature-extract → per-group aggregate.
  */
object Multimodal {
  import Tables._

  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               width: Int, height: Int, channels: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
                                 mean_px: Double, max_px: Double, feat: Seq[Double])

  /** Deterministic media corpus derived from `documents`: the UTF-8 text
    * bytes are the opaque payload; metadata is derived from n_chars. (The
    * driver testdata ships no real media; payload contents are irrelevant
    * to the plumbing being exercised, exactly like an opaque JPEG.)
    */
  def corpus(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        lit(3).as("channels"),
        col("lang").as("format_tag")).as("meta"))

  /** STUB decode: bytes → float "pixels" in [0,1]. Stands in for a JPEG/
    * PNG decoder; deterministic so the pipeline is testable offline.
    * (Delegates to [[TextBytesCodec]] — the default [[MediaCodec]]; real
    * decoders plug in through `extractFeatures(codec = ...)`.)
    */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    TextBytesCodec.open().decode(payload, 0, 0, 3)

  /** Fixed-size resize by mean-pooling into `buckets` cells — the stand-in
    * for bilinear image resize.
    */
  def resizePool(px: Array[Float], buckets: Int): Array[Double] = {
    val out = new Array[Double](buckets)
    val cnt = new Array[Int](buckets)
    var i = 0
    while (i < px.length) {
      val b = (i.toLong * buckets / px.length).toInt
      out(b) += px(i); cnt(b) += 1; i += 1
    }
    var j = 0
    while (j < buckets) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
    out
  }

  /** The reference mechanism: decode + featurize inside mapPartitions so
    * any per-partition setup (a real decoder context, a model) is paid
    * once per partition, not per row. No shuffle — embarrassingly
    * parallel over the corpus.
    */
  def extractFeatures(s: SparkSession, d: String,
                      codec: MediaCodec = TextBytesCodec): DataFrame = {
    import s.implicits._
    corpus(s, d)
      .select(col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder session, closed even on task failure
        val dec = codec.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
        it.map { r =>
          val px = dec.decode(r.payload, r.width, r.height, r.channels)
          val pooled = resizePool(px, 8)
          var sum = 0.0; var mx = 0.0
          var bsum = 0L
          var i = 0
          while (i < px.length) {
            sum += px(i); mx = math.max(mx, px(i))
            bsum += (r.payload(i) & 0xff)
            i += 1
          }
          // empty payload → zeroed features (no NaN mean / -Inf max)
          val mean = if (px.length == 0) 0.0 else sum / px.length
          MediaFeatures(r.doc_id, px.length.toLong, bsum, mean, mx, pooled.toSeq)
        }
      }
      .toDF()
  }

  val all: Seq[Spec] = Seq(
    // Declared end-to-end pipeline: ingest → decode(stub) → resize(pool) →
    // featurize → aggregate by language. The decode/pool stages run in
    // typed mapPartitions, so only the scalar aggregate is SQL — which is
    // what the oracle can state independently: mean_px of UTF-8 text bytes
    // is expressible as an ascii-fold in DuckDB.
    Spec("mm_pipeline",
      (s, d) => {
        val feats = extractFeatures(s, d)
        val docs = t(s, d, "documents").select("doc_id", "lang")
        feats.join(broadcast(docs), "doc_id")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_media"),
            sum("n_bytes").as("total_bytes"),
            // exact integer byte sums → identical IEEE divisions both sides
            round(sum("byte_sum") / lit(255.0) / sum("n_bytes"), 6).as("weighted_mean_px"))
          .orderBy("lang")
      },
      // UTF-8 text here is ASCII (verified: length == octet_length for all
      // docs), so byte values == code points: the decode stub's weighted
      // mean equals an exact integer ord-fold stated independently in SQL.
      Some("""SELECT lang, count(*) AS n_media,
                CAST(sum(length(text)) AS BIGINT) AS total_bytes,
                round(CAST(sum(list_reduce(list_transform(
                      string_split_regex(text, ''), ch -> ord(ch)),
                      (a, b) -> a + b)) AS BIGINT) / 255.0
                  / CAST(sum(length(text)) AS BIGINT), 6) AS weighted_mean_px
              FROM documents GROUP BY lang ORDER BY lang"""))
  )
}
