package graft
import org.apache.spark.sql.SparkSession

/** Targeted query runner for local iteration: time + count named declared
  * queries at a given sf dir without paying for the full Verify/Bench
  * sweep. Usage:
  *   sbt "runMain graft.RunOne <sfDir> <query> [query ...]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[runone] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // post-action executed plan (AQE-final) on demand — shows
      // ReusedExchange/ReusedSubquery nodes that a pre-action explain
      // cannot (set SPARK_GRAFT_EXPLAIN=1)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
