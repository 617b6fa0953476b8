package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (docs/SCALE.md): when one join/agg key
  * carries a disproportionate share of rows, append a deterministic salt
  * in [0, buckets) to the skewed (large) side and explode the small side
  * across every salt value — the hot key's rows spread over `buckets`
  * shuffle partitions instead of one straggler task.
  *
  * AQE's skew-join splitting handles most cases automatically; this
  * utility is for the aggregation-skew and pre-AQE-planning cases. The
  * salt is derived from stable row content (a hash of salted-side
  * columns), NOT rand(), so plans stay deterministic and re-runnable.
  */
object Salting {

  /** A `_salt` value in [0, buckets) derived from the given columns. Salt
    * from as many row columns as possible: hashing only a low-cardinality
    * column would collapse a hot key's rows into one bucket and defeat the
    * rewrite.
    */
  def saltOf(buckets: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(buckets))

  /** Salted equi-join: `large` (skewed) joins `small` on `key`; the small
    * side is replicated across all salt values so every (key, salt) pair
    * finds its match.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val l = large.withColumn("_salt",
      saltOf(buckets, large.columns.toIndexedSeq.map(col): _*))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key — the classic skewed-groupBy rewrite. The salt
    * hashes ALL columns so even constant-valued hot keys spread.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     buckets: Int = 16): DataFrame =
    df.withColumn("_salt", saltOf(buckets, df.columns.toIndexedSeq.map(col): _*))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as("sum_value"))
}
