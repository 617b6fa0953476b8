package graft

import org.apache.spark.SparkEnv
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Fault drill for the localCheckpoint trade (round-10 verdict #3).
  *
  * `ScalableCumulate.materialize()` documents that localCheckpoint blocks
  * are NOT resilient to executor loss — a lost block fails the job and the
  * batch retries from source. Nothing exercised that failure path until
  * now: this drill materializes a derived relation on a REAL two-executor
  * `local-cluster[2,1,1024]`, takes the ground truth from the live (still
  * recomputable) lineage, hard-kills one executor JVM from inside a task
  * (`System.exit` conditioned on the executor id — the same process death
  * a preempted node or OOM-killed container produces), then runs a
  * consumer over the checkpointed relation and verifies the contract:
  *
  *  - EITHER the consumer completes and its result equals the ground
  *    truth (every needed block happened to survive / Spark recovered),
  *  - OR it fails LOUDLY (the documented "Checkpoint block not found"
  *    class — lineage is truncated, recompute is impossible),
  *  - and NEVER returns silently wrong rows.
  *
  * Run via `bash tools/multijvm.sh` (which exports SPARK_HOME /
  * SPARK_SCALA_VERSION for the worker's executor command builder) or
  * through CheckpointFaultSpec, which launches this main in a child JVM
  * with that environment set.
  */
object CheckpointFaultSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      // ground truth from the live lineage, BEFORE any fault
      val expected = base.agg(sum("q")).head().get(0)
      // spread checkpoint blocks across both executors, then realize them
      val m = ops.ScalableCumulate.materialize(base.repartition(8))
      println(s"[fault] materialized ${m.count()} rows across 2 executors")
      // hard-kill executor "0" from inside a task: a real process death,
      // not a graceful decommission. The kill job itself completes — tasks
      // lost with the executor are retried on the survivor/replacement
      // (the condition is false there).
      try {
        spark.range(0, 16, 1, 8).foreachPartition { (_: Iterator[java.lang.Long]) =>
          if (SparkEnv.get.executorId == "0") {
            System.err.println("[fault] executor 0 exiting deliberately")
            System.exit(137)
          }
        }
      } catch {
        case e: Throwable =>
          println(s"[fault] kill job threw (acceptable): ${e.getClass.getSimpleName}")
      }
      Thread.sleep(3000) // let the master register the loss
      val outcome =
        try {
          val got = m.agg(sum("q")).head().get(0)
          if (String.valueOf(got) == String.valueOf(expected)) "retry-correct"
          else s"SILENT-WRONG got=$got expected=$expected"
        } catch {
          case e: Throwable =>
            val root = Iterator.iterate(e: Throwable)(_.getCause)
              .takeWhile(_ != null).toSeq.last
            s"loud-failure ${root.getClass.getSimpleName}: " +
              String.valueOf(root.getMessage).linesIterator.take(1).mkString
        }
      println(s"[fault] consumer outcome: $outcome")
      if (outcome.startsWith("SILENT-WRONG")) {
        println("[fault] FAIL — checkpointed consumer returned wrong rows")
        sys.exit(1)
      }
      // the contract also requires the SOURCE path to still work: a fresh
      // plan over the live lineage must survive the executor loss via
      // ordinary task retry on the remaining/replacement executors
      val after = base.agg(sum("q")).head().get(0)
      if (String.valueOf(after) != String.valueOf(expected)) {
        println(s"[fault] FAIL — live-lineage recompute wrong: $after vs $expected")
        sys.exit(1)
      }
      println(s"[fault] PASS — $outcome; live lineage recomputed correctly")
    } finally spark.stop()
  }
}
