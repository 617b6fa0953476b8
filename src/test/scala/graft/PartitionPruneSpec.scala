package graft

import org.scalatest.funsuite.AnyFunSuite

/** scan_partition_prune: the event_type filter must prune at PLANNING
  * time (PartitionFilters), not per-row after the scan.
  */
class PartitionPruneSpec extends AnyFunSuite {
  import TestSpark._

  test("partition filter reaches the scan and prunes directories") {
    val df = q("scan_partition_prune")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("click", "purchase"))
    val plan = df.queryExecution.executedPlan.toString
    // the filter must be INSIDE the partition-filter set — a bare
    // "PartitionFilters: []" or event_type appearing only in aggregate
    // keys must not pass
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n${plan.linesIterator.take(15).mkString("\n")}")
    // the pushed filter set must NOT carry event_type as a data filter —
    // it is a partition column, resolved before any file is opened
    assert(!plan.contains("PushedFilters: [In(event_type"),
      "event_type leaked into data filters instead of partition filters")
  }

  test("scan_dpp: dim filter prunes fact partitions at RUNTIME (DPP)") {
    val df = q("scan_dpp")
    // only the conversion-category partitions survive
    assert(df.collect().map(_.getString(0)).toSeq == Seq("purchase", "signup"))
    // the fact scan must carry a DynamicPruningExpression in its
    // PartitionFilters — the category filter lives on the DIM, so the
    // fact's partition set is only resolvable at runtime via the dim's
    // reused broadcast. A static IN-list here would not count.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningExpression in fact scan:\n${plan.linesIterator.take(25).mkString("\n")}")
  }
}
