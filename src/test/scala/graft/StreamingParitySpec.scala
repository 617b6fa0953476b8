package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch parity (SURVEY.md §5.4): each streaming query's
  * drained result must equal its relational twin.
  */
class StreamingParitySpec extends AnyFunSuite {
  import TestSpark._

  test("stream_tumbling equals its batch twin") {
    val s = q("stream_tumbling").collect().toSeq
    val b = q("agg_window_tumbling_batch").collect().toSeq
    assert(s == b)
  }

  test("native streaming sliding window equals the tumbling-derived stream_sliding") {
    // stream_sliding derives 10/5-min sliding counts from the shared
    // tumbling drain (ops/Streaming.scala tumblingSink); this runs the
    // GENUINE streaming sliding-window operator over the same feed and
    // asserts the derivation is exact.
    val e = Tables.events(spark, sf)
    val native = graft.streaming.StreamRunner.run(
      spark, Seq(e), e.schema, "complete",
      cacheKey = s"single|$sf", drainKey = s"slide_native|$sf") { src =>
      src.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))
    }.orderBy("ws", "event_type")
    assert(native.collect().toSeq == q("stream_sliding").collect().toSeq)
  }

  test("stream_dedup restores exact per-type counts despite injected dups") {
    val streamed = q("stream_dedup")
    val batch = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n")).orderBy("event_type")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_stateful final counts equal batch per-user counts") {
    val streamed = q("stream_stateful")
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events")).orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_session: sessions partition each user's events") {
    val sess = q("stream_session")
    val perUser = sess.groupBy("user_id").agg(sum("n").as("total"))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("total2"))
    assert(perUser.join(batch, "user_id")
      .where(col("total") =!= col("total2")).count() == 0)
    // session bounds sane: start <= last event, end = last + gap > start
    assert(sess.where(col("se_us") <= col("ss_us")).count() == 0)
  }

  test("stream_watermark_late drops exactly the closed-window late rows") {
    val streamed = q("stream_watermark_late")
      .agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
    val total = Tables.events(spark, sf).count()
    assert(streamed < total) // some late rows must actually be dropped
  }

  test("stream_stateful_tws (RocksDB store) equals batch per-user counts") {
    val streamed = q("stream_stateful_tws")
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events")).orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_stream_join matches the batch interval join") {
    val streamed = q("stream_stream_join")
    val e = Tables.events(spark, sf)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"), col("ts").as("c_ts"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select("p_id", "c_id", "user_id").orderBy("p_id", "c_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
