package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one seam Spark doesn't expose publicly: constructing a DataFrame
  * from a [[LogicalPlan]]. `classic.Dataset.ofRows` is `private[sql]`, so
  * this shim lives inside the `org.apache.spark.sql` namespace — the
  * standard idiom extension libraries use for exactly this purpose.
  */
object DatasetShim {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
