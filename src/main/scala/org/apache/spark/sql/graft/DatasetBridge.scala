package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge (Dataset.ofRows is private[sql] in
  * Spark 4's classic module). Lets graft.plans construct DataFrames from
  * custom logical nodes — the whole-operator extension path (custom
  * LogicalPlan + SparkStrategy + SparkPlan) needs a way to hand its node
  * back to the session.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
