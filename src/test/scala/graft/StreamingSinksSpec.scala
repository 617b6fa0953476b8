package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sink capabilities beyond the in-memory harness:
  *  - checkpointed parquet file sink: exactly-once across a restart
  *    (second AvailableNow drain over the SAME checkpoint + input
  *    reprocesses nothing — no duplicate rows in the sink);
  *  - the built-in unbounded rate source feeding a streaming aggregate
  *    (the everything-is-a-file harness is a choice, not a limitation).
  */
class StreamingSinksSpec extends AnyFunSuite {
  import TestSpark._

  test("parquet file sink is exactly-once across a checkpoint restart") {
    val base = Files.createTempDirectory("graft_fsink_").toFile
    base.deleteOnExit()
    val in = new java.io.File(base, "in"); in.mkdirs()
    val out = new java.io.File(base, "out").getPath
    val ckpt = new java.io.File(base, "ckpt").getPath

    val s = spark
    import s.implicits._
    // two input files = two micro-batches (maxFilesPerTrigger=1)
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(in.getPath)
    Seq((3L, "c"), (4L, "d")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(in.getPath)

    def drain(): Unit = {
      val q = spark.readStream
        .schema("id LONG, tag STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(in.getPath)
        .withColumn("doubled", col("id") * 2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    drain()
    val first = spark.read.parquet(out)
    assert(first.count() == 4)
    assert(first.agg(sum("doubled")).head.getLong(0) == 20L)

    // restart over the same checkpoint and unchanged input: nothing new
    drain()
    assert(spark.read.parquet(out).count() == 4, "restart duplicated rows")

    // new data after restart is picked up exactly once
    Seq((5L, "e")).toDF("id", "tag").coalesce(1).write.mode("append").parquet(in.getPath)
    drain()
    val finalDf = spark.read.parquet(out)
    assert(finalDf.count() == 5)
    assert(finalDf.where(col("id") === 5).count() == 1)
  }

  test("windowed-agg state is backend-agnostic: RocksDB == default provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val default = q("stream_tumbling").collect().toSeq
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // q("stream_tumbling") is drain-memoized (StreamRunner drainKey), so
      // a second call would return the already-drained sink without ever
      // touching RocksDB — run the same build as a FRESH drain instead
      // (empty drainKey bypasses the sink cache; cacheKey still reuses the
      // batch files).
      val e = Tables.events(spark, sf)
      val rocks = graft.streaming.StreamRunner.run(
        spark, Seq(e), e.schema, "complete", cacheKey = s"single|$sf") { src =>
        src.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), Tables.msum(col("value")).as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("ws"),
            col("event_type"), col("n"), col("sum_value"))
      }.orderBy("ws", "event_type").collect().toSeq
      assert(rocks == default)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch sink: arbitrary per-microbatch logic with batch ids") {
    val base = Files.createTempDirectory("graft_feb_").toFile
    base.deleteOnExit()
    val in = new java.io.File(base, "in"); in.mkdirs()
    val s = spark
    import s.implicits._
    Seq(1L, 2L).toDF("id").coalesce(1).write.mode("append").parquet(in.getPath)
    Seq(3L, 4L, 5L).toDF("id").coalesce(1).write.mode("append").parquet(in.getPath)

    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.schema("id LONG")
      .option("maxFilesPerTrigger", 1).parquet(in.getPath)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        seen.put(batchId, batch.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.size() == 2, s"expected 2 micro-batches, saw $seen")
    import scala.jdk.CollectionConverters._
    assert(seen.values().asScala.sum == 5)
  }

  test("rate source feeds an unbounded streaming aggregate") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).option("numPartitions", 2)
      .load()
      .groupBy().agg(count(lit(1)).as("n"), max("value").as("mx"))
      .writeStream.format("memory").queryName("graft_rate_sink")
      .outputMode("complete")
      .start()
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 30000
      while (n < 100 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val rows = spark.table("graft_rate_sink").collect()
        if (rows.nonEmpty) n = rows.head.getLong(0)
      }
      assert(n >= 100, s"rate source produced only $n rows in 30s")
      // rate source values are 0..n-1: max must be consistent with count
      val r = spark.table("graft_rate_sink").collect().head
      assert(r.getLong(1) < r.getLong(0) + 500)
    } finally q.stop()
  }
}
