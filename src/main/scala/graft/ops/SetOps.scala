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
              ORDER BY op, nationkey""")),

    // Schema-evolution union: two relations with PARTIALLY overlapping
    // columns combined by NAME, absent columns null-filled — the shape
    // every multi-source ingest hits when shard schemas drift. Spark's
    // `unionByName(allowMissingColumns = true)` resolves by name at plan
    // time (still a zero-shuffle concat); the oracle states the ANSI
    // desugaring (explicit NULL-typed columns in positional UNION ALL).
    Spec("set_union_by_name",
      (s, d) => {
        val c = t(s, d, "customer").select(col("c_custkey").as("id"),
          col("c_acctbal").as("bal"), lit("cust").as("src"))
        val p = t(s, d, "supplier").select(col("s_suppkey").as("id"),
          col("s_name").as("name"), lit("supp").as("src"))
        c.unionByName(p, allowMissingColumns = true).orderBy("src", "id")
      },
      Some("""SELECT c_custkey AS id, c_acctbal AS bal, 'cust' AS src,
                     CAST(NULL AS VARCHAR) AS name
              FROM customer
              UNION ALL
              SELECT s_suppkey, CAST(NULL AS DOUBLE), 'supp', s_name
              FROM supplier
              ORDER BY src, id"""))
  )
}
