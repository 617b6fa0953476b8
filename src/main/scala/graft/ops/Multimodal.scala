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

  /** Frame sampling: treat the payload as fixed-size frames and keep every
    * `every`-th — the video-ingest stand-in (sample k frames per clip
    * before the expensive decode). Runs BEFORE decode so skipped frames
    * are never decoded, which is the point at scale.
    */
  def frameSample(payload: Array[Byte], frameBytes: Int, every: Int): Seq[Array[Byte]] =
    payload.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % every == 0 => f }.toSeq

  /** Spread a doc_id-grain relation across the session's full parallelism
    * before a per-row media encode/decode (round 15). The testdata is one
    * small parquet file → ONE scan split, so every synthesized-media query
    * ran its whole PNG/PCM round trip single-threaded regardless of core
    * count. The exchanged rows are bare 8-byte ids — negligible against
    * per-row codec work at ANY corpus size — and round-robin repartition
    * is retry-safe (sort-before-repartition is on by default). Queries
    * that carry real payload bytes (mm_pipeline, the extractFeatures
    * family) deliberately do NOT use this: shuffling payloads to gain
    * local parallelism is exactly the heavy-bytes-move the 100 TB plan
    * must avoid; their parallelism comes from input splits.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** The reference mechanism: decode + featurize inside mapPartitions so
    * any per-partition setup (a real decoder context, a model) is paid
    * once per partition, not per row. No shuffle — embarrassingly
    * parallel over the corpus.
    */
  def extractFeatures(s: SparkSession, d: String,
                      codec: MediaCodec = TextBytesCodec): DataFrame =
    extractFeaturesFrom(s, corpus(s, d), codec)

  /** Same pipeline over ANY media relation with (doc_id, payload, meta)
    * columns — the entry point a real ingest (binaryFile, kafka) feeds.
    * Decoded length is independent of payload length for real codecs
    * (a PNG's pixel count ≠ its compressed byte count), so the raw-byte
    * checksum and the pixel statistics iterate separately.
    */
  def extractFeaturesFrom(s: SparkSession, media: DataFrame,
                          codec: MediaCodec = TextBytesCodec): DataFrame = {
    import s.implicits._
    media
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
          var i = 0
          while (i < px.length) {
            sum += px(i); mx = math.max(mx, px(i))
            i += 1
          }
          var bsum = 0L
          var j = 0
          while (j < r.payload.length) { bsum += (r.payload(j) & 0xff); j += 1 }
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
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Frame sampling ahead of decode (every 4th 16-byte frame), per-doc
    // sampled-frame count + byte sum — embarrassingly parallel flatMap,
    // zero shuffle before the presentation sort. The oracle re-states the
    // sampled positions with substr + generate_series (documents are
    // ASCII, so ord(ch) == byte value — same invariant mm_pipeline uses).
    Spec("mm_frame_sample",
      (s, d) => {
        import s.implicits._
        corpus(s, d).select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.flatMap { case (id, p) =>
            val frames = frameSample(p, 16, 4)
            if (frames.isEmpty) None
            else Some((id, frames.length.toLong,
              frames.iterator.map(_.iterator.map(b => (b & 0xff).toLong).sum).sum))
          })
          .toDF("doc_id", "n_frames", "byte_sum")
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
                -- generate_series needs constant bounds: 4095 frames covers
                -- any document up to 64 KiB (fixture max is ~600 bytes);
                -- the length predicate drops out-of-range frame indices
                SELECT doc_id, gs.i AS frame_idx,
                       substr(text, CAST(gs.i * 16 + 1 AS INT), 16) AS frame
                FROM documents, generate_series(0, 4095) gs(i)
                WHERE length(text) > 0 AND gs.i % 4 = 0
                  AND gs.i < ceil(length(text) / 16.0))
              SELECT doc_id, count(*) AS n_frames,
                CAST(sum(list_reduce(list_transform(
                  string_split_regex(frame, ''), ch -> ord(ch)), (a, b) -> a + b))
                  AS BIGINT) AS byte_sum
              FROM f GROUP BY doc_id ORDER BY doc_id""")),

    // REAL image decode in a DECLARED query (closes the round-4 caveat that
    // declared multimodal paths only ran the byte stub): deterministic RGB
    // images are synthesized per doc inside the executors — pixel (x,y) of
    // doc i has channels r=(7i+13x+31y)%256, g=(11i+17x+5y)%256,
    // b=(3i+19x+23y)%256 — PNG-encoded with javax.imageio (lossless), then
    // decoded BACK through the same [[ImageIoCodec]] mapPartitions seam the
    // production pipeline uses (per-partition decoder session, closed via
    // task-completion listener). The emitted per-channel integer sums are
    // computed from the DECODED floats, so any decode defect (channel swap,
    // row-major error, color-model drift, lossy re-encode) breaks the
    // oracle, which restates the pixel formula independently in SQL.
    // Embarrassingly parallel, zero shuffle before the presentation sort —
    // the 100 TB shape is identical with real payloads read from parquet.
    Spec("mm_decode_real",
      (s, d) => {
        import s.implicits._
        spread(t(s, d, "documents").select(col("doc_id"))).as[Long]
          .mapPartitions { it =>
            val dec = ImageIoCodec.open()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
            it.map { id =>
              val w = (id % 7 + 2).toInt
              val h = (id % 5 + 2).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
                  val g = ((id * 11 + x * 17 + y * 5) % 256).toInt
                  val b = ((id * 3 + x * 19 + y * 23) % 256).toInt
                  img.setRGB(x, y, (r << 16) | (g << 8) | b)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              val px = dec.decode(bos.toByteArray, w, h, 3)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                // decode emits k/255f; *255f + round restores k exactly
                sr += math.round(px(i) * 255f).toLong
                sg += math.round(px(i + 1) * 255f).toLong
                sb += math.round(px(i + 2) * 255f).toLong
                i += 3
              }
              (id, w.toLong, h.toLong, (w.toLong * h), sr, sg, sb)
            }
          }
          .toDF("doc_id", "w", "h", "n_px", "sum_r", "sum_g", "sum_b")
          .orderBy("doc_id")
      },
      Some("""WITH dims AS (
                SELECT doc_id, doc_id % 7 + 2 AS w, doc_id % 5 + 2 AS h
                FROM documents),
              cells AS (
                SELECT doc_id, w, h, gx.x AS x, gy.y AS y
                FROM dims, generate_series(0, 8) gx(x), generate_series(0, 6) gy(y)
                WHERE gx.x < w AND gy.y < h)
              SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
                CAST(w * h AS BIGINT) AS n_px,
                CAST(sum((doc_id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS sum_r,
                CAST(sum((doc_id * 11 + x * 17 + y * 5) % 256) AS BIGINT) AS sum_g,
                CAST(sum((doc_id * 3 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
              FROM cells GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // RESIZE — the standard image-preprocessing op (every vision model
    // wants a fixed input grid), as nearest-neighbor down/up-sampling to
    // 4×4 AFTER the real PNG decode. Source index sx = ⌊rx·w/4⌋ is pure
    // integer arithmetic, so the oracle reproduces the exact sampled
    // pixels from the image formula; channel sums of the 16 sampled
    // texels are exact BIGINTs. Same per-partition codec session +
    // task-completion close as mm_decode_real; at 100 TB resize runs
    // in-executor on the decoded buffer — zero extra shuffle, output
    // shrinks to fixed 4×4×3 per image regardless of source size.
    Spec("mm_image_resize",
      (s, d) => {
        import s.implicits._
        spread(t(s, d, "documents").select(col("doc_id"))).as[Long]
          .mapPartitions { it =>
            val dec = ImageIoCodec.open()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
            it.map { id =>
              val w = (id % 7 + 2).toInt
              val h = (id % 5 + 2).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
                  val g = ((id * 11 + x * 17 + y * 5) % 256).toInt
                  val b = ((id * 3 + x * 19 + y * 23) % 256).toInt
                  img.setRGB(x, y, (r << 16) | (g << 8) | b)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              val px = dec.decode(bos.toByteArray, w, h, 3)
              var sr = 0L; var sg = 0L; var sb = 0L
              var ry = 0
              while (ry < 4) {
                val sy = ry * h / 4
                var rx = 0
                while (rx < 4) {
                  val sx = rx * w / 4
                  val i = (sy * w + sx) * 3
                  sr += math.round(px(i) * 255f).toLong
                  sg += math.round(px(i + 1) * 255f).toLong
                  sb += math.round(px(i + 2) * 255f).toLong
                  rx += 1
                }
                ry += 1
              }
              (id, w.toLong, h.toLong, sr, sg, sb)
            }
          }
          .toDF("doc_id", "w", "h", "rs_r", "rs_g", "rs_b")
          .orderBy("doc_id")
      },
      Some("""WITH dims AS (
                SELECT doc_id, doc_id % 7 + 2 AS w, doc_id % 5 + 2 AS h
                FROM documents),
              cells AS (
                SELECT doc_id, w, h,
                  (gx.rx * w) // 4 AS x, (gy.ry * h) // 4 AS y
                FROM dims, generate_series(0, 3) gx(rx),
                     generate_series(0, 3) gy(ry))
              SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
                CAST(sum((doc_id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS rs_r,
                CAST(sum((doc_id * 11 + x * 17 + y * 5) % 256) AS BIGINT) AS rs_g,
                CAST(sum((doc_id * 3 + x * 19 + y * 23) % 256) AS BIGINT) AS rs_b
              FROM cells GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // AUDIO through the same codec seam: deterministic 16-bit PCM clips —
    // sample i of doc d is (31d+17i) mod 4096 − 2048, little-endian-packed
    // in the executors — decode through [[PcmCodec]] (the per-partition
    // session mechanism, unchanged), then the standard audio featurization:
    // frame into 256-sample windows and emit per-frame energy Σ|s|. Energy
    // is reconstructed from the DECODED floats (s/32768 is exact, so
    // round(px·32768) restores the sample losslessly) — an endianness or
    // sign-extension defect in the decode breaks the oracle, which restates
    // the sample formula independently. Embarrassingly parallel flatMap,
    // zero shuffle before the presentation sort — with real WAV payloads
    // from parquet the plan is identical.
    Spec("mm_audio_energy",
      (s, d) => {
        import s.implicits._
        spread(t(s, d, "documents").select(col("doc_id"))).as[Long]
          .mapPartitions { it =>
            val dec = PcmCodec.open()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
            it.flatMap { id =>
              val n = 1024
              val bytes = new Array[Byte](n * 2)
              var i = 0
              while (i < n) {
                val v = ((id * 31 + i * 17) % 4096 - 2048).toInt
                bytes(2 * i) = (v & 0xff).toByte
                bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
                i += 1
              }
              val px = dec.decode(bytes, 0, 0, 1)
              (0 until n / 256).map { f =>
                var e = 0L
                var j = f * 256
                while (j < (f + 1) * 256) {
                  e += math.abs(math.round(px(j) * 32768f))
                  j += 1
                }
                (id, f.toLong, e)
              }
            }
          }
          .toDF("doc_id", "frame_id", "energy")
          .orderBy("doc_id", "frame_id")
      },
      Some("""WITH cells AS (
                SELECT doc_id, gs.i AS i,
                  (doc_id * 31 + gs.i * 17) % 4096 - 2048 AS s
                FROM documents, generate_series(0, 1023) gs(i))
              SELECT doc_id, i // 256 AS frame_id,
                CAST(sum(abs(s)) AS BIGINT) AS energy
              FROM cells GROUP BY doc_id, i // 256
              ORDER BY doc_id, frame_id""")),

    // IMAGE NEAR-DUP via perceptual average-hash — the multimodal twin of
    // dedup_exact: a vision-data pipeline dedups screenshots/memes by a
    // content hash of the DECODED pixels, not the file bytes (re-encoded
    // copies share pixels but not bytes). Each doc renders a deterministic
    // 8×8 PNG whose pixel formula depends on doc_id % 40 — forty "motifs",
    // each repeated by many docs, exactly the duplicate structure aHash
    // exists to find. In-executor: real javax.imageio decode through the
    // codec seam (per-partition session + task-completion close), integer
    // luminance 299r+587g+114b, bit i = lum_i·64 > Σlum (strict, pure
    // integer — no mean division), bits packed y-major into a 64-char
    // string. Dedup is then a hash-grain groupBy: n_imgs per hash +
    // min-doc canonical, the dedup_exact shape at perceptual grain.
    // Scale: decode+hash is per-row executor work (zero shuffle); the
    // groupBy shuffles 64-byte keys — two-phase hash agg, same 100 TB
    // shape as dedup_exact. The oracle reproduces the hash from the pixel
    // formula (construct-then-parse, the mm_decode_real design).
    Spec("mm_phash_dedup",
      (s, d) => {
        import s.implicits._
        val hashed = spread(t(s, d, "documents").select(col("doc_id"))).as[Long]
          .mapPartitions { it =>
            val dec = ImageIoCodec.open()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
            it.map { id =>
              val seed = id % 40
              val img = new java.awt.image.BufferedImage(
                8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val r = ((seed * 7 + x * 13 + y * 31) % 256).toInt
                  val g = ((seed * 11 + x * 17 + y * 5) % 256).toInt
                  val b = ((seed * 3 + x * 19 + y * 23) % 256).toInt
                  img.setRGB(x, y, (r << 16) | (g << 8) | b)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              val px = dec.decode(bos.toByteArray, 8, 8, 3)
              val lum = new Array[Long](64)
              var total = 0L
              var i = 0
              while (i < 64) {
                val r = math.round(px(3 * i) * 255f).toLong
                val g = math.round(px(3 * i + 1) * 255f).toLong
                val b = math.round(px(3 * i + 2) * 255f).toLong
                lum(i) = 299L * r + 587L * g + 114L * b
                total += lum(i)
                i += 1
              }
              val sb = new StringBuilder(64)
              i = 0
              while (i < 64) {
                sb.append(if (lum(i) * 64L > total) '1' else '0')
                i += 1
              }
              (id, sb.toString)
            }
          }
          .toDF("doc_id", "ahash")
        hashed.groupBy("ahash")
          .agg(count(lit(1)).as("n_imgs"), min("doc_id").as("canonical_id"))
          .orderBy("canonical_id")
      },
      Some("""WITH px AS (
                SELECT doc_id, gy.y, gx.x,
                  299 * (((doc_id % 40) * 7 + gx.x * 13 + gy.y * 31) % 256)
                    + 587 * (((doc_id % 40) * 11 + gx.x * 17 + gy.y * 5) % 256)
                    + 114 * (((doc_id % 40) * 3 + gx.x * 19 + gy.y * 23) % 256)
                    AS lum
                FROM documents, generate_series(0, 7) gx(x),
                  generate_series(0, 7) gy(y)),
              tot AS (
                SELECT doc_id, CAST(sum(lum) AS BIGINT) AS total
                FROM px GROUP BY doc_id),
              bits AS (
                SELECT p.doc_id, p.y, p.x,
                  CASE WHEN p.lum * 64 > t.total THEN '1' ELSE '0' END AS b
                FROM px p JOIN tot t USING (doc_id)),
              ah AS (
                SELECT doc_id, string_agg(b, '' ORDER BY y, x) AS ahash
                FROM bits GROUP BY doc_id)
              SELECT ahash, count(*) AS n_imgs, min(doc_id) AS canonical_id
              FROM ah GROUP BY ahash ORDER BY canonical_id""")),

    // Per-channel color statistics + dominant channel over REAL-decoded
    // pixels (the color-profile featurizer): exact integer channel sums
    // from the javax.imageio round trip, argmax channel with the
    // documented r ≥ g ≥ b tie order. Same construct-then-parse design
    // as mm_decode_real — the oracle recomputes the channel sums from
    // the pixel FORMULA, so a decode that permutes channels, clamps, or
    // gamma-shifts any value hash-mismatches. Decode is per-row executor
    // work; the output is already at row grain (zero shuffle before the
    // presentation sort).
    Spec("mm_dominant_channel",
      (s, d) => {
        import s.implicits._
        spread(t(s, d, "documents").select(col("doc_id"))).as[Long]
          .mapPartitions { it =>
            val dec = ImageIoCodec.open()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
            it.map { id =>
              val seed = id % 40
              val img = new java.awt.image.BufferedImage(
                8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val r = ((seed * 7 + x * 13 + y * 31) % 256).toInt
                  val g = ((seed * 11 + x * 17 + y * 5) % 256).toInt
                  val b = ((seed * 3 + x * 19 + y * 23) % 256).toInt
                  img.setRGB(x, y, (r << 16) | (g << 8) | b)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              val px = dec.decode(bos.toByteArray, 8, 8, 3)
              var rs = 0L; var gs = 0L; var bs = 0L
              var i = 0
              while (i < 64) {
                rs += math.round(px(3 * i) * 255f).toLong
                gs += math.round(px(3 * i + 1) * 255f).toLong
                bs += math.round(px(3 * i + 2) * 255f).toLong
                i += 1
              }
              val dom = if (rs >= gs && rs >= bs) "r"
                        else if (gs >= bs) "g" else "b"
              (id, rs, gs, bs, dom)
            }
          }
          .toDF("doc_id", "r_sum", "g_sum", "b_sum", "dominant")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  CAST(sum(((doc_id % 40) * 7 + gx.x * 13 + gy.y * 31) % 256) AS BIGINT) AS r_sum,
                  CAST(sum(((doc_id % 40) * 11 + gx.x * 17 + gy.y * 5) % 256) AS BIGINT) AS g_sum,
                  CAST(sum(((doc_id % 40) * 3 + gx.x * 19 + gy.y * 23) % 256) AS BIGINT) AS b_sum
                FROM documents, generate_series(0, 7) gx(x),
                     generate_series(0, 7) gy(y)
                GROUP BY doc_id)
              SELECT doc_id, r_sum, g_sum, b_sum,
                CASE WHEN r_sum >= g_sum AND r_sum >= b_sum THEN 'r'
                     WHEN g_sum >= b_sum THEN 'g' ELSE 'b' END AS dominant
              FROM p ORDER BY doc_id"""))
  )
}
