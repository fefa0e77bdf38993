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

  /** Rebuild `table` targeting `targetRows` rows per output file, PRESERVING
    * its physical policy (distribution/bucketing, clustered sort, month
    * partitioning, graft.* TBLPROPERTIES) by routing the rewrite back through
    * Ctas.create — a REPLICATE table keeps auto-broadcasting and a HASH table
    * keeps collocation after the rebuild. Returns the target file count
    * (hash-bucketed tables keep their bucket count instead).
    */
  def rebuild(spark: SparkSession, table: String,
      targetRows: Long = StorageViews.RowgroupTarget): Int = {
    import graft.catalog.{Distribution, TablePolicy}
    import graft.sources.Ctas
    val df = spark.table(table)
    val total = df.count()
    val nFiles = math.max(1, math.ceil(total.toDouble / targetRows).toInt)
    val cols = df.columns
    val policy = TablePolicy.of(spark, table)
    val prepared = policy.distribution match {
      case Distribution.Hash(_, _) => df // bucket spec governs the layout
      case _ => df.repartition(nFiles)
    }
    val tmp = s"${table}_graft_rebuild"
    Ctas.create(spark, prepared, tmp, policy, label = Some(s"rebuild $table"))
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    // RENAME on a managed table moves the location; verify integrity
    require(spark.table(table).count() == total, "rebuild lost rows")
    require(spark.table(table).columns.sorted.sameElements(cols.sorted),
      "rebuild lost columns")
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
