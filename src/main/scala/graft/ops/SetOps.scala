package graft.ops

import graft.{Spec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2 category G — set operations.
  *
  * All five forms over (customer nation-keys) vs (supplier nation-keys).
  * Outputs are single-column key sets/bags sorted totally — duplicate rows
  * are identical, so the sort is hash-stable. Scale: UNION is a no-shuffle
  * concat; DISTINCT/INTERSECT/EXCEPT hash-shuffle on the full row — exactly
  * how they must distribute at 100 TB.
  */
object SetOps {
  import Tables._

  private def custKeys(s: SparkSession, d: String) =
    t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
  private def suppKeys(s: SparkSession, d: String) =
    t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))

  val all: Seq[Spec] = Seq(
    Spec("set_union_all",
      (s, d) => custKeys(s, d).unionAll(suppKeys(s, d)).orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              UNION ALL SELECT s_nationkey FROM supplier
              ORDER BY nationkey""")),

    Spec("set_union_distinct",
      (s, d) => custKeys(s, d).union(suppKeys(s, d)).distinct().orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              UNION SELECT s_nationkey FROM supplier
              ORDER BY nationkey""")),

    Spec("set_intersect",
      (s, d) => custKeys(s, d).intersect(suppKeys(s, d)).orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              INTERSECT SELECT s_nationkey FROM supplier
              ORDER BY nationkey""")),

    Spec("set_except",
      (s, d) => custKeys(s, d).except(suppKeys(s, d)).orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              EXCEPT SELECT s_nationkey FROM supplier
              ORDER BY nationkey""")),

    // Bag semantics: INTERSECT ALL ∪all EXCEPT ALL, tagged.
    Spec("set_intersect_all",
      (s, d) => {
        val i = custKeys(s, d).intersectAll(suppKeys(s, d)).withColumn("op", lit("intersect_all"))
        val e = custKeys(s, d).exceptAll(suppKeys(s, d)).withColumn("op", lit("except_all"))
        i.unionByName(e).select("op", "nationkey").orderBy("op", "nationkey")
      },
      Some("""SELECT 'intersect_all' AS op, nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                INTERSECT ALL SELECT s_nationkey FROM supplier)
              UNION ALL
              SELECT 'except_all' AS op, nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                EXCEPT ALL SELECT s_nationkey FROM supplier)
              ORDER BY op, nationkey"""))
  )
}
