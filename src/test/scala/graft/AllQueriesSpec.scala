package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes every declared query at sf0.001 — a regression net for the
  * full surface (the invariants specs only cover a subset). Queries that
  * legitimately return empty relations at this scale are listed; everything
  * else must produce rows.
  */
class AllQueriesSpec extends AnyFunSuite {
  import TestSpark._

  private val mayBeEmpty = Set(
    "join_anti",            // every customer has orders in this data
    "set_except",           // supplier nations cover customer nations
    "dedup_near_shingle",   // no ≥0.9-Jaccard pair may exist at tiny sf
    "dedup_minhash_lsh",    // approx candidates above threshold
    "eval_topk_err"         // in principle a perfect model has no errors
  )

  for (spec <- SparkEntry.specs) {
    test(s"query ${spec.name} executes" +
        (if (spec.oracle.isDefined) " (oracle-checked)" else " (rows-only)")) {
      val n = spec.fn(spark, sf).count()
      if (!mayBeEmpty(spec.name)) assert(n > 0, s"${spec.name} returned 0 rows")
    }
  }
}
