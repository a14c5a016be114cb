package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** private[sql] accessor bridge — the standard pattern third-party Spark
  * extension libraries use to build a DataFrame from a custom LogicalPlan
  * (Dataset.ofRows is private[sql]).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
