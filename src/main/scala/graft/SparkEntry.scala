package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from one `Spec` list per SURVEY.md
  * §2 category (graft.ops.*). Every oracle-checked query ends with a total
  * ORDER BY and uses only deterministic expressions (Tables.scala scaladoc).
  */
object SparkEntry {
  /** All declared operator specs, one list per SURVEY.md §2 category. */
  def specs: Seq[Spec] =
    ops.Rel.all ++ ops.Joins.all ++ ops.TpchJoins.all ++ ops.TpchJoins2.all ++ ops.Aggs.all ++
      ops.Windows.all ++ ops.SetOps.all ++ ops.Fns.all ++ ops.Fns2.all ++
      ops.Inference.all ++ ops.InferMapPartitions.all ++ ops.LlmOps.all ++
      ops.TextAnalysis.all ++ ops.SimGraph.all ++
      ops.Streaming.all ++ ops.Multimodal.all ++ ops.LlmOps2.all ++ ops.LlmOps3.all ++ ops.LlmOps4.all ++
      ops.Analytics.all ++ ops.Analytics2.all ++ ops.Analytics3.all ++
      ops.Analytics4.all ++ ops.Analytics5.all ++ ops.Analytics6.all ++
      ops.TypedAggs.all ++ ops.Warehouse.all

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggs.q1Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(sql => sp.name -> sql)).toMap
}
