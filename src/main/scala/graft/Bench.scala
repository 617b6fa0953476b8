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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
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
