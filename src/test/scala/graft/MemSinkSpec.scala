package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MemSink

/** DSv2 write connector: append/overwrite via the V2 protocol, task
  * fan-out, and all-or-nothing commit on failure.
  */
class MemSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = spark.range(0, 1000).toDF("id")
    .withColumn("label", concat(lit("row"), col("id")))
    .repartition(4)

  test("append writes all task partitions exactly once") {
    MemSink.clear("t1")
    df.write.format("graft.sources.MemSink").option("name", "t1")
      .mode("append").save()
    val rows = MemSink.rows("t1")
    assert(rows.length == 1000)
    assert(rows.map(_.head.asInstanceOf[Long]).sorted == (0L until 1000L))
    assert(MemSink.schemaOf("t1").get.fieldNames.toSeq == Seq("id", "label"))

    df.write.format("graft.sources.MemSink").option("name", "t1")
      .mode("append").save()
    assert(MemSink.rows("t1").length == 2000)
  }

  test("overwrite mode truncates through SupportsTruncate") {
    MemSink.clear("t2")
    df.write.format("graft.sources.MemSink").option("name", "t2")
      .mode("append").save()
    df.limit(10).write.format("graft.sources.MemSink").option("name", "t2")
      .mode("overwrite").save()
    assert(MemSink.rows("t2").length == 10)
  }

  test("streaming write: epoch commits, exactly-once across a restart") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    MemSink.clear("st1")
    val src = Files.createTempDirectory("memsink_stream_src_").toFile
    val ckpt = Files.createTempDirectory("memsink_stream_ckpt_").toFile
    def feed(lo: Int, hi: Int, batch: String): Unit =
      spark.range(lo, hi).toDF("id").coalesce(1)
        .write.mode("append").parquet(src.getPath + s"/b$batch")
    feed(0, 500, "1")
    val schema = spark.read.parquet(src.getPath + "/b1").schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .parquet(src.getPath + "/*")
        .writeStream.format("graft.sources.MemSink")
        .option("name", "st1")
        .option("checkpointLocation", ckpt.getPath)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(MemSink.rows("st1").length == 500)
    feed(500, 800, "2")
    drain() // restart from checkpoint: only the NEW batch commits
    val ids = MemSink.rows("st1").map(_.head.asInstanceOf[Long]).sorted
    assert(ids == (0L until 800L), s"got ${ids.length} rows")
  }

  test("duplicate epoch commit is a no-op; a new queryId gets fresh epochs") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    MemSink.clear("ep")
    val schema = StructType(Seq(StructField("v", LongType)))
    MemSink.commitEpoch("ep", "q1", schema, 0L, Seq(Vector(Seq(1L))), truncate = false)
    // re-delivered epoch (driver recovery re-commit): must be discarded
    MemSink.commitEpoch("ep", "q1", schema, 0L, Seq(Vector(Seq(99L))), truncate = false)
    MemSink.commitEpoch("ep", "q1", schema, 1L, Seq(Vector(Seq(2L))), truncate = false)
    // an INDEPENDENT query reusing the table restarts epochs at 0 — kept
    MemSink.commitEpoch("ep", "q2", schema, 0L, Seq(Vector(Seq(3L))), truncate = false)
    assert(MemSink.rows("ep").map(_.head) == Vector(1L, 2L, 3L))
  }

  test("a failed job commits nothing (all-or-nothing batch commit)") {
    MemSink.clear("t3")
    df.write.format("graft.sources.MemSink").option("name", "t3")
      .mode("append").save()
    val before = MemSink.rows("t3")
    val boom = df.withColumn("id",
      when(col("id") === 997, expr("raise_error('task failure')").cast("long"))
        .otherwise(col("id")))
    intercept[Exception] {
      boom.write.format("graft.sources.MemSink").option("name", "t3")
        .mode("append").save()
    }
    assert(MemSink.rows("t3") == before, "failed write must not change the table")
  }
}
