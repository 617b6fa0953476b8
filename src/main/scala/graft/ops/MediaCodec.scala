package graft.ops

/** Pluggable media-decode seam for the multimodal pipeline.
  *
  * A real deployment plugs a JPEG/PNG/audio decoder in here; this
  * container ships no media libraries, so the default codec is the
  * documented deterministic stub (bytes → normalized float "pixels").
  * The seam is shaped for the expensive case:
  *
  *  - [[MediaCodec]] is the SERIALIZABLE factory shipped to executors
  *    (closure-captured by `mapPartitions`). It must hold no native
  *    state — only configuration.
  *  - [[MediaDecoder]] is the PER-PARTITION session built by
  *    `codec.open()` once per partition, so native contexts / model
  *    handles / scratch buffers are amortized across the partition's
  *    rows (the reference's mapPartitions mechanism). It is closed via
  *    task-completion listener even if the task fails mid-stream.
  */
trait MediaDecoder extends AutoCloseable {
  /** Decode one payload into float features in [0,1]; metadata comes from
    * the record's typed meta struct. */
  def decode(payload: Array[Byte], width: Int, height: Int, channels: Int): Array[Float]
  override def close(): Unit = ()
}

trait MediaCodec extends Serializable {
  def name: String
  /** Build a per-partition decoder session. Called once per partition. */
  def open(): MediaDecoder
}

/** Default codec: the deterministic byte-normalization stub (stands in
  * for a real image decoder; see Multimodal scaladoc for why).
  */
object TextBytesCodec extends MediaCodec {
  override val name: String = "text-bytes"
  override def open(): MediaDecoder = new MediaDecoder {
    override def decode(payload: Array[Byte], width: Int, height: Int,
                        channels: Int): Array[Float] =
      payload.map(b => (b & 0xff).toFloat / 255.0f)
  }
}

/** REAL audio decoder behind the same seam: 16-bit little-endian PCM —
  * the raw sample format inside WAV — decoded to floats in [-1, 1).
  * s/32768 = s·2⁻¹⁵ is EXACT in binary floating point, so downstream
  * integer reconstruction (`round(px * 32768f)`) is lossless — the same
  * exactness argument ImageIoCodec's k/255 channels rely on.
  */
object PcmCodec extends MediaCodec {
  override val name: String = "pcm-s16le"
  override def open(): MediaDecoder = new MediaDecoder {
    override def decode(payload: Array[Byte], width: Int, height: Int,
                        channels: Int): Array[Float] = {
      val n = payload.length / 2
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val lo = payload(2 * i) & 0xff
        val hi = payload(2 * i + 1).toInt // sign-extending byte→int
        out(i) = ((hi << 8) | lo).toFloat / 32768.0f
        i += 1
      }
      out
    }
  }
}

/** REAL image decoder behind the same seam: `javax.imageio` ships with
  * the JDK (no external libraries), so PNG/JPEG/BMP/GIF payloads decode
  * to row-major normalized RGB floats with zero new dependencies. The
  * driver's testdata carries no real media (its payloads are opaque text
  * bytes), so the DECLARED queries keep [[TextBytesCodec]]; this codec
  * proves the seam takes a genuine decoder unchanged — exercised over
  * deterministic in-memory PNGs in MultimodalSpec.
  *
  * ImageIO.read is not guaranteed thread-safe across shared readers; a
  * fresh decoder per partition (the seam's contract) keeps sessions
  * isolated.
  */
object ImageIoCodec extends MediaCodec {
  override val name: String = "imageio"
  // ImageIO's stream cache defaults to DISK (a FileCacheImageInputStream
  // temp file per read/write — and the encode side in the mm_ queries
  // pays the same per ImageIO.write). Every payload here is an in-memory
  // byte array, so the temp-file round trip is pure I/O overhead: at
  // sf0.1 the per-row PNG encode+decode queries create tens of thousands
  // of temp files per sweep, and on hosts with slow tmp storage the mm_
  // block ran ~2× its quiet band from this alone. Memory-backed cache is
  // the documented switch for byte-array sources (round 15; JVM-global,
  // idempotent).
  javax.imageio.ImageIO.setUseCache(false)
  override def open(): MediaDecoder = new MediaDecoder {
    override def decode(payload: Array[Byte], width: Int, height: Int,
                        channels: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff) / 255.0f
          out(i + 1) = ((rgb >> 8) & 0xff) / 255.0f
          out(i + 2) = (rgb & 0xff) / 255.0f
          i += 3
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
