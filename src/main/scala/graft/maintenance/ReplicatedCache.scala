package graft.maintenance

import graft.catalog.TablePolicy
import org.apache.spark.sql.SparkSession

/** Replicated-table cache refresh (reference: samples/automation/
  * RefreshReplicatedTable/RefreshReplicatedTable.ps1:37-56): after a
  * replicated table is modified, the reference's per-node caches go
  * 'NotReady' and the first query pays the rebuild; the automation touches
  * each such table (`SELECT TOP 1 *`) to warm them eagerly.
  *
  * Spark analog: REPLICATE-class tables broadcast per query; the warm state
  * is the block-manager cache. `refresh` drops the stale cached plan and
  * re-materializes it, so subsequent broadcasts read hot blocks.
  */
object ReplicatedCache {

  /** All catalog tables marked replicate. */
  def replicatedTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).filter { t =>
      spark.sql(s"SHOW TBLPROPERTIES `$t`").collect()
        .exists(r => r.getString(0) == TablePolicy.PropDistribution &&
          r.getString(1) == "replicate")
    }.toSeq

  /** Refresh one table: invalidate metadata + cache, then touch
    * (`SELECT TOP 1` ≈ limit(1)) to rebuild eagerly.
    */
  def refresh(spark: SparkSession, table: String): Unit = {
    spark.catalog.refreshTable(table)
    spark.catalog.cacheTable(table)
    spark.table(table).limit(1).collect()
  }

  /** Refresh every replicated table (the automation loop). Returns the
    * refreshed table names.
    */
  def refreshAll(spark: SparkSession): Seq[String] = {
    val ts = replicatedTables(spark)
    ts.foreach(refresh(spark, _))
    ts
  }
}
