package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB ANN layout promised in docs/SCALE.md: embeddings written
  * partitioned by their coarse cluster (the centroid assignment), so a
  * probe search reads ONLY its cluster's files — partition pruning visible
  * as PartitionFilters in the scan.
  */
class IvfLayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("cluster-partitioned layout prunes probe scans and preserves results") {
    val dir = Files.createTempDirectory("graft_ivf_").toFile
    dir.deleteOnExit()
    val assigned = Tables.t(spark, sf, "embeddings")
      .join(ops.Inference.preds(spark, sf).select(col("vec_id"), col("pred").as("cell")), "vec_id")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dir.getPath)

    val layout = spark.read.parquet(dir.getPath)
    val probeCell = 3
    val pruned = layout.where(col("cell") === probeCell)

    // 1. partition pruning reaches the scan
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"no partition pruning in:\n$scan")

    // 2. the pruned read equals the filtered full relation
    val expect = assigned.where(col("cell") === probeCell)
      .select("vec_id").orderBy("vec_id").collect().toSeq
    val got = pruned.select("vec_id").orderBy("vec_id").collect().toSeq
    assert(got == expect && got.nonEmpty)

    // 3. files actually laid out one directory per cluster
    val cells = dir.listFiles().filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cells.size >= 5, s"expected per-cluster dirs, got $cells")
  }
}
