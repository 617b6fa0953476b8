package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of merge join (graft.plans.AsOfMergeJoinExec): result parity
  * with the relational rewrite (cond-join + window top-1), plan shape
  * (custom exec node present, no row-exploding join + window), and edge
  * semantics (null keys/times drop, unmatched left rows drop, tie-break
  * takes the max tiebreak column).
  */
class AsOfNativeSpec extends AnyFunSuite {
  import TestSpark._

  test("join_asof_native matches join_asof row-for-row") {
    val native = q("join_asof_native")
    val rel = q("join_asof")
    assert(native.count() > 0)
    assert(native.exceptAll(rel).count() == 0)
    assert(rel.exceptAll(native).count() == 0)
  }

  test("physical plan uses AsOfMergeJoinExec, not join+window") {
    val native = q("join_asof_native")
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"))
    // the native path must not fall back to the exploding rewrite
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"))
  }

  test("as-of semantics: latest right <= t, tie-break max, nulls drop") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1, 10, "a"), // matches t=10 exactly
      (1, 5, "b"),  // matches t=5
      (1, 4, "c"),  // before all right rows -> drops
      (2, 99, "d"), // key with no right rows -> drops
      (3, 7, "e")   // null-time right rows ignored
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Integer.valueOf(1), Integer.valueOf(5), 50),
      (Integer.valueOf(1), Integer.valueOf(10), 100),
      (Integer.valueOf(1), Integer.valueOf(10), 101), // tie: higher v wins
      (Integer.valueOf(1), Integer.valueOf(11), 110),
      (Integer.valueOf(3), null, 999),
      (null, Integer.valueOf(1), 888)
    ).toDF("k", "t2", "v")
    val out = graft.plans.Asof.join(
        left, leftKey = "k", leftTime = "t",
        right, rightKey = "k", rightTime = "t2", rightTieBreak = Seq("v"))
      .select("tag", "v").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 101, "b" -> 50))
  }

  test("left rows with duplicate (key,time) each emit one row") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10, "x"), (1, 10, "y")).toDF("k", "t", "tag")
    val right = Seq((1, 9, 90)).toDF("k", "t2", "v")
    val out = graft.plans.Asof.join(
        left, "k", "t", right, "k", "t2").select("tag", "v")
      .as[(String, Int)].collect().toSet
    assert(out == Set(("x", 90), ("y", 90)))
  }
}
