package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN twin of [[ScaleSpec]]: MEASURES the similarity-search scale
  * story instead of arguing it. sim_ivf's 100 TB claim is that the
  * coarse-quantizer cluster join scans only each probe's cell — a
  * constant FRACTION of the corpus (≈ 1/cells) — while brute force scans
  * everything. This spec builds derived embedding corpora at 1×, 3×, and
  * 10× (same temp-dir fixture pattern as ScaleSpec; NOT a regeneration
  * of driver testdata) and asserts both halves of that claim with exact
  * arithmetic, not tolerances:
  *
  *  - Replicating every vector (fresh vec_ids, identical coordinates and
  *    labels) leaves the per-label centroid MEANS bit-identical, so each
  *    replica point lands in the same cell as its original and every
  *    cell grows by exactly N×. The probe set (vec_id < 5) stays the
  *    original five vectors.
  *  - Therefore IVF scanned-candidate counts must grow EXACTLY N× (a
  *    quadratic candidate generator would grow ~N²×), and the pruning
  *    fraction scanned/brute must be scale-INVARIANT — the property that
  *    makes cluster-pruned search viable when the corpus no longer fits
  *    a broadcast.
  */
class SimScaleSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val base = "/root/testdata/sf0.01"

  /** Build an N× embeddings fixture under a temp dir; returns its sfDir. */
  private def fixture(factor: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_simscale_${factor}x_")
    dir.toFile.deleteOnExit()
    val emb = Tables.t(s, base, "embeddings")
    val replicas: Seq[DataFrame] = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }
    replicas.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  /** (n_vectors, ivf_scanned, brute_scanned, secs) at one scale. */
  private def probe(sfDir: String): (Long, Long, Long, Double) = {
    val t0 = System.nanoTime()
    val assign = ops.Inference.preds(s, sfDir).select("vec_id", "pred")
    val n = assign.count()
    val p = assign.where(col("vec_id") < 5)
      .select(col("vec_id").as("p_id"), col("pred").as("p_cell"))
    val ivf = assign.join(broadcast(p),
      col("pred") === col("p_cell") && col("vec_id") =!= col("p_id")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    (n, ivf, 5L * (n - 1), secs)
  }

  test("IVF scanned-candidate counts grow linearly and the pruning fraction is scale-invariant to 10x") {
    val rungs = Seq(1, 3, 10).map { f =>
      val dir = if (f == 1) base else fixture(f)
      val r = probe(dir)
      info(f"scale ${f}%2dx: vectors=${r._1}%7d ivf_scanned=${r._2}%8d " +
        f"brute=${r._3}%8d fraction=${r._2.toDouble / r._3}%.4f " +
        f"probe=${r._4}%6.2fs")
      (f, r)
    }
    val (_, (n1, ivf1, brute1, _)) = rungs.head
    // the quantizer must actually prune: scanning ≥ half the corpus per
    // probe would mean the cluster join degenerated to brute force
    assert(ivf1.toDouble / brute1 < 0.5,
      f"IVF scans ${ivf1.toDouble / brute1}%.2f of brute force at 1x — no pruning")
    for ((f, (nN, ivfN, bruteN, _)) <- rungs.tail) {
      assert(nN == f * n1, s"fixture at ${f}x should hold ${f * n1} vectors")
      // each probe's cell grows exactly f×, and only the probe's own
      // vec_id is excluded from its scan — its f−1 coordinate-identical
      // replicas ARE scanned. With 5 probes: ivfN = f·(ivf1 + 5) − 5,
      // an exact closed form (1×282 → 3×856 → 10×2865 observed).
      assert(ivfN == f * (ivf1 + 5) - 5,
        s"${f}x: expected exactly ${f * (ivf1 + 5) - 5} scanned " +
          s"candidates, got $ivfN — cell assignment drifted or the " +
          s"generator is super-linear (quadratic would be " +
          s"~${f.toLong * f * ivf1})")
      // pruning fraction stays flat (→ cell share of the corpus), never
      // drifting toward brute force's 1.0
      assert(math.abs(ivfN.toDouble / bruteN - ivf1.toDouble / brute1) < 0.01)
    }
  }

  test("IVF pruning holds one more decade: 100x (round 13)") {
    // Same treatment the dedup curve got in round 13 (ScaleSpec 100x):
    // the 100 TB claim extrapolates decades past the 10x rung, so
    // measure one more. The closed form and the scale-invariant
    // fraction must hold at a corpus 100x the sf0.01 base (= 10x the
    // sf0.1 board's embeddings table).
    val (n1, ivf1, brute1, _) = probe(base)
    val (n100, ivf100, brute100, secs) = probe(fixture(100))
    info(f"scale 100x: vectors=$n100%7d ivf_scanned=$ivf100%9d " +
      f"brute=$brute100%9d fraction=${ivf100.toDouble / brute100}%.4f " +
      f"probe=$secs%.1fs")
    assert(n100 == 100 * n1)
    assert(ivf100 == 100L * (ivf1 + 5) - 5,
      s"expected exactly ${100L * (ivf1 + 5) - 5} scanned candidates, " +
        s"got $ivf100 (quadratic would be ~${10000L * ivf1})")
    assert(math.abs(ivf100.toDouble / brute100 - ivf1.toDouble / brute1) < 0.01)
  }
}
