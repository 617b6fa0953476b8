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
