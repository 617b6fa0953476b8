package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints per-query timings to stderr (and one stdout line),
  * then ends stdout with a SHORT `{"metric":"total",...}` JSON line — the
  * driver's tail capture must see that line un-truncated, so the long
  * per-query map never shares it. Query failures are logged loudly instead
  * of silently benching as -1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-reader warmup, outside any per-query timing —
    // otherwise the first query is charged ~5 s of JIT + classloading.
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(r.select(r.col("r_regionkey")), "r_regionkey").count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    var failed = List.empty[String]
    // Stable sorted order (a Map iteration order decided which query
    // absorbed residual warmup in r1-r3) + min-of-2 timing per query: the
    // first run still pays JIT/classload/drain setup, the second is the
    // steady-state number the 2x gate should see. Run-to-run variance on
    // identical bytecode swung single queries 0.6s->5.1s between rounds.
    val queryMap = SparkEntry.queries
    val results: Seq[(String, Double)] = queryMap.keys.toSeq.sorted.map { name =>
      val fn = queryMap(name)
      val t0 = System.nanoTime()
      val secs =
        try {
          fn(spark, sfDir).count()
          val first = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          fn(spark, sfDir).count()
          math.min(first, (System.nanoTime() - t1) / 1e9)
        } catch {
          case e: Throwable =>
            failed ::= name
            System.err.println(s"[bench] FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
            (System.nanoTime() - t0) / 1e9
        }
      name -> secs
    }
    // Budget guard: any steady-state (min-of-2) query over 2 s is loud on
    // stderr, so a regression is diagnosable from the driver tail alone.
    results.filter(_._2 > 2.0).foreach { case (k, v) =>
      System.err.println(f"[bench] SLOW $k $v%.2f")
    }
    // Per-category subtotals (category = query-name prefix): localizes a
    // round-over-round delta to one operator family at a glance.
    results.groupBy(_._1.takeWhile(_ != '_')).toSeq.sortBy(_._1)
      .foreach { case (cat, rs) =>
        System.err.println(
          f"[bench] subtotal $cat ${rs.map(_._2).sum}%.2f (${rs.size} queries)")
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Long per-query line FIRST (stderr too, for redundancy)…
    println(s"""{"metric":"per_query","queries":$qs,"sf":"$sfDir"}""")
    System.err.println(s"""[bench] per_query $qs""")
    if (failed.nonEmpty)
      System.err.println(s"""[bench] failed_queries ${failed.mkString(",")}""")
    // …short total line LAST so a tail capture always parses it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size}}""")
    spark.stop()
  }
}
