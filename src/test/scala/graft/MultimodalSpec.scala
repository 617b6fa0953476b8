package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing: schema, decode-stub determinism, pooled
  * feature shape, and the `binaryFile` raw-media ingestion source.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("corpus schema: opaque binary payload + typed metadata struct") {
    val c = ops.Multimodal.corpus(spark, sf)
    val sc = c.schema
    assert(sc("payload").dataType.typeName == "binary")
    assert(sc("meta").dataType.typeName == "struct")
    assert(c.select("meta.width", "meta.height", "meta.channels").count() > 0)
  }

  test("decode stub is deterministic and normalized to [0,1]") {
    val bytes = "hello media".getBytes("UTF-8")
    val a = ops.Multimodal.decodeStub(bytes)
    val b = ops.Multimodal.decodeStub(bytes)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(v => v >= 0.0f && v <= 1.0f))
  }

  test("resize pool emits fixed-size feature vectors for any input length") {
    for (n <- Seq(1, 7, 64, 1000)) {
      val px = Array.tabulate(n)(i => (i % 255) / 255.0f)
      assert(ops.Multimodal.resizePool(px, 8).length == 8)
    }
  }

  test("feature extraction: one feature row per media record, 8-d pooled vec") {
    val feats = ops.Multimodal.extractFeatures(spark, sf)
    val docs = Tables.t(spark, sf, "documents").count()
    assert(feats.count() == docs)
    assert(feats.where(size(col("feat")) =!= 8).count() == 0)
    assert(feats.where(col("mean_px") < 0 || col("mean_px") > 1).count() == 0)
  }

  test("binaryFile source ingests raw media files with path + length + bytes") {
    val dir = Files.createTempDirectory("graft_media_").toFile
    dir.deleteOnExit()
    for (i <- 0 until 5) {
      val f = new java.io.File(dir, s"img_$i.bin")
      Files.write(f.toPath, Array.tabulate[Byte](16 + i)(j => (i * 16 + j).toByte))
    }
    val df = spark.read.format("binaryFile").load(dir.getPath)
    assert(df.count() == 5)
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    // decode the ingested bytes through the same stub pipeline
    val decoded = df.select(col("path"), col("content")).collect()
      .map(r => ops.Multimodal.decodeStub(r.getAs[Array[Byte]]("content")))
    assert(decoded.forall(_.nonEmpty))
  }

  test("frame sampling keeps every k-th fixed-size frame, short tail included") {
    val p = Array.tabulate[Byte](70)(_.toByte) // 5 frames of 16 (last is 6 bytes)
    val frames = ops.Multimodal.frameSample(p, 16, 4)
    assert(frames.length == 2) // indices 0 and 4
    assert(frames(0).toSeq == (0 until 16).map(_.toByte))
    assert(frames(1).toSeq == (64 until 70).map(_.toByte))
    assert(ops.Multimodal.frameSample(Array.empty[Byte], 16, 4).isEmpty)
    assert(ops.Multimodal.frameSample(Array[Byte](1, 2), 16, 1).length == 1)
  }

  test("pluggable codec: open() amortized once per partition, sessions closed") {
    CountingCodec.reset()
    val parts = ops.Multimodal.corpus(spark, sf).rdd.getNumPartitions
    val feats = ops.Multimodal.extractFeatures(spark, sf, codec = CountingCodec)
    val docs = Tables.t(spark, sf, "documents").count()
    assert(feats.count() == docs)
    // one decoder session per partition, not per row; every session closed
    assert(CountingCodec.opens.get() == parts,
      s"opens=${CountingCodec.opens.get()} partitions=$parts")
    assert(CountingCodec.closes.get() == CountingCodec.opens.get())
    assert(CountingCodec.decodes.get() == docs)
  }

  test("REAL image decode: javax.imageio PNGs through the same pipeline") {
    import java.awt.image.BufferedImage
    // deterministic PNGs built in memory: (w, h, rgb-fill)
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    import spark.implicits._
    val media = Seq(
      (1L, png(2, 2, 0xff0000), 2, 2),  // pure red: channels (1,0,0)
      (2L, png(3, 1, 0x4080c0), 3, 1),  // mixed: (64,128,192)/255
    ).toDF("doc_id", "payload", "w", "h")
      .select(col("doc_id"), col("payload"),
        struct(col("w").as("width"), col("h").as("height"),
          lit(3).as("channels"), lit("png").as("format_tag")).as("meta"))
    val feats = ops.Multimodal
      .extractFeaturesFrom(spark, media, codec = ops.ImageIoCodec)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // red 2x2: 12 floats, four 1.0s → mean 1/3, max 1.0
    assert(feats(1L).getAs[Long]("n_bytes") == 12L)
    assert(math.abs(feats(1L).getAs[Double]("mean_px") - 1.0 / 3) < 1e-12)
    assert(feats(1L).getAs[Double]("max_px") == 1.0)
    // mixed 3x1: mean = (64+128+192)/(3*255), max = 192/255 — PNG is
    // lossless so decoded channel values are exact
    assert(feats(2L).getAs[Long]("n_bytes") == 9L)
    assert(math.abs(feats(2L).getAs[Double]("mean_px") - 384.0 / (3 * 255.0)) < 1e-7)
    assert(math.abs(feats(2L).getAs[Double]("max_px") - 192.0f / 255.0f) < 1e-12)
    // byte checksum is over the COMPRESSED payload, not the pixels
    assert(feats(1L).getAs[Long]("byte_sum") ==
      png(2, 2, 0xff0000).map(b => (b & 0xff).toLong).sum)
  }

  test("a custom codec's output flows through the feature pipeline") {
    // constant-0.5 codec → mean_px 0.5 and max_px 0.5 for every record
    val feats = ops.Multimodal.extractFeatures(spark, sf, codec = HalfCodec)
    assert(feats.where(col("mean_px") =!= 0.5 || col("max_px") =!= 0.5).count() == 0)
  }

  test("REAL audio decode: 16-bit LE PCM roundtrips every sample exactly") {
    // every representable sample value, including the sign-extension and
    // endianness edges (-32768, -1, 0, 1, 32767)
    val samples = Array(-32768, -32767, -256, -255, -1, 0, 1, 255, 256, 32766, 32767)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val dec = ops.PcmCodec.open()
    val px = dec.decode(bytes, 0, 0, 1)
    assert(px.length == samples.length)
    samples.zip(px).foreach { case (v, f) =>
      // s/32768 is exact in float, so the roundtrip must be bit-exact
      assert(math.round(f * 32768f) == v, s"sample $v decoded to $f")
      assert(f >= -1.0f && f < 1.0f)
    }
    dec.close()
  }
}

/** Test codec counting session lifecycle events (local mode: one JVM, so
  * static atomics observe executor-side calls). */
object CountingCodec extends graft.ops.MediaCodec {
  val opens = new java.util.concurrent.atomic.AtomicLong
  val closes = new java.util.concurrent.atomic.AtomicLong
  val decodes = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = { opens.set(0); closes.set(0); decodes.set(0) }
  override val name = "counting"
  override def open(): graft.ops.MediaDecoder = {
    opens.incrementAndGet()
    new graft.ops.MediaDecoder {
      override def decode(p: Array[Byte], w: Int, h: Int, c: Int): Array[Float] = {
        decodes.incrementAndGet(); p.map(b => (b & 0xff).toFloat / 255.0f)
      }
      override def close(): Unit = closes.incrementAndGet()
    }
  }
}

object HalfCodec extends graft.ops.MediaCodec {
  override val name = "half"
  override def open(): graft.ops.MediaDecoder =
    (p: Array[Byte], w: Int, h: Int, c: Int) => Array.fill(math.max(p.length, 1))(0.5f)
}
