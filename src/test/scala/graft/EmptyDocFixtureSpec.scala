package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the degree-0 / empty-text edge case of the round-15 set-grain
  * rewrites (r15 verdict #5): graph_degree_dist and dedup_cluster_sizes
  * moved their anchor from the `documents` table to the token-set
  * `groups` relation, which is equivalent ONLY if every document lands
  * in a group. The driver fixtures contain no empty-text docs (checked:
  * 0 at every SF), so this spec builds one: `split("", " ")` yields
  * `[""]`, i.e. an empty text still tokenizes to the one-element set
  * {""} and must ride through the groups-anchored queries at degree 0 /
  * cluster size 1 — never vanish from the histogram.
  *
  * Corpus: doc 0 = empty text (the edge case), docs 1,2 = identical
  * text (one group of two, intra-group adjacency only), doc 3 = unique
  * text (isolated singleton), docs 4,5 = distinct 19-token sets sharing
  * 18 tokens (jaccard = 18/20 = 0.90 exactly — a real cross-set
  * verified pair, exercising the inclusive >= 0.9 boundary and the
  * neighbor-set contribution terms).
  */
class EmptyDocFixtureSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_emptydoc_")
    d.toFile.deleteOnExit()
    import s.implicits._
    val t19a = (1 to 19).map(i => s"t$i").mkString(" ")  // t1..t19
    val t19b = (2 to 20).map(i => s"t$i").mkString(" ")  // t2..t20
    Seq(
      (0L, ""),
      (1L, "a b"), (2L, "a b"),
      (3L, "zzz unique words here"),
      (4L, t19a), (5L, t19b))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.toString
  }

  test("empty-text doc tokenizes to a one-element set, not no set") {
    import s.implicits._
    val ts = Seq("").toDF("text")
      .select(array_sort(array_distinct(split(col("text"), " "))).as("ts"))
      .head().getSeq[String](0)
    assert(ts == Seq(""), s"empty text tokenized to $ts")
  }

  test("graph_degree_dist keeps degree-0 docs under the groups anchor") {
    val rows = SparkEntry.queries("graph_degree_dist")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // docs 0 (empty) and 3 (unique) are isolated; 1,2 see their set-mate;
    // 4,5 see each other across the verified 0.90 pair
    assert(rows == Seq((0L, 2L), (1L, 4L)),
      s"degree histogram was $rows — the empty-text doc must appear at degree 0")
  }

  test("dedup_cluster_sizes counts singleton clusters under the groups anchor") {
    val rows = SparkEntry.queries("dedup_cluster_sizes")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // size-1 clusters: docs 0 and 3; size-2: {1,2} (identical set) and
    // {4,5} (verified 0.90 pair)
    assert(rows == Seq((1L, 2L, 2L), (2L, 2L, 4L)),
      s"cluster-size histogram was $rows — singletons (incl. the empty-text doc) must be counted")
  }

  test("dedup_canonical keeps the empty-text doc as its own canonical") {
    val r = SparkEntry.queries("dedup_canonical")(s, dir)
      .where(col("doc_id") === 0L).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
      s"empty-text doc mapped to canonical ${r.getLong(1)} with ${r.getLong(2)} neighbors")
  }
}
