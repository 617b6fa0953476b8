package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** text_chunk edge cases + the oracle's constant-series headroom. */
class ChunkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("empty and sub-stride documents chunk correctly") {
    val docs = Seq((1L, ""), (2L, "ab"), (3L, "x" * 96), (4L, "y" * 97),
      (5L, "z" * 300)).toDF("doc_id", "text")
    val out = graft.ops.Analytics.chunkDocs(docs)
      .select("doc_id", "chunk_id", "chunk_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq(
      // doc 1 (empty): no rows; doc 2: one short chunk
      (2L, 0L, 2),
      (3L, 0L, 96), // exactly one stride: one chunk
      (4L, 0L, 97), (4L, 1L, 1), // one char spills into chunk 1
      (5L, 0L, 128), (5L, 1L, 128), (5L, 2L, 108), (5L, 3L, 12)))
  }

  test("oracle's generate_series bound has ample headroom over fixtures") {
    val maxLen = Tables.t(spark, sf, "documents")
      .agg(max(length(col("text")))).head().getInt(0)
    // oracle series covers docs to 255*96 chars; fixtures must stay far below
    assert(maxLen <= 255 * 96 / 10, s"fixture text length $maxLen erodes oracle headroom")
  }
}
