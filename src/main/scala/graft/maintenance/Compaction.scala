package graft.maintenance

import graft.catalog.StorageViews
import org.apache.spark.sql.SparkSession

/** `ALTER INDEX ALL ON t REBUILD` analog (SURVEY.md §2.9 D6; reference:
  * samples/scripts/indexes/generate_rebuild_all.sql:2-15): rewrite a parquet
  * table into right-sized files so every rowgroup approaches the
  * 1,048,576-row target (TableHealthCount.sql:15) — the columnstore
  * re-compression that fixes trimmed/undersized segments.
  */
object Compaction {

  /** Rebuild `table` targeting `targetRows` rows per output file. Returns the
    * new file count.
    */
  def rebuild(spark: SparkSession, table: String,
      targetRows: Long = StorageViews.RowgroupTarget): Int = {
    val df = spark.table(table)
    val total = df.count()
    val nFiles = math.max(1, math.ceil(total.toDouble / targetRows).toInt)
    val cols = df.columns
    val tmp = s"${table}_graft_rebuild"
    df.repartition(nFiles).write.mode("overwrite").format("parquet")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    // RENAME on a managed table moves the location; verify integrity
    require(spark.table(table).count() == total, "rebuild lost rows")
    require(spark.table(table).columns.sameElements(cols), "rebuild lost columns")
    nFiles
  }

  /** Tables whose rowgroup health recommends a rebuild (the generator-script
    * pattern: scan health view → emit rebuild commands).
    */
  def rebuildCandidates(spark: SparkSession,
      tables: Map[String, String]): Seq[String] =
    StorageViews.rowgroupHealth(spark, tables)
      .filter(org.apache.spark.sql.functions.col("rebuild_recommended"))
      .select("table_name").collect().map(_.getString(0)).toSeq
}
