package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole test run (SURVEY.md §5.4). */
object TestSpark {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse_")
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)
}
