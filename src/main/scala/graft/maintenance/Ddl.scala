package graft.maintenance

import graft.catalog.TablePolicy
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** DDL reverse-engineering (SURVEY.md §2.9 D11) — reconstruct a runnable
  * CREATE TABLE statement from the live catalog, like the reference's
  * `usp_ConstructCreateStatementForTable` (reference:
  * samples/scripts/deployments/usp_ConstructCreateStatementForTable.sql:13-144):
  * columns + types + nullability from the schema, distribution/layout/
  * partition policy from our table properties.
  */
object Ddl {

  private[maintenance] def quote(id: String): String =
    s"`${id.replace("`", "``")}`"

  /** CREATE SCHEMA (SURVEY.md §2.9 D1; reference:
    * samples/databases/wide-world-importers/security/schemas/fact.sql:1,
    * solutions/monitoring/scripts/schema/microsoft.sql:4) — a T-SQL schema
    * maps to a Spark namespace/database; tables land in it via the
    * `schema.table` qualified name (Ctas passes qualified names through).
    */
  def createSchema(spark: SparkSession, name: String,
      ifNotExists: Boolean = true): Unit = {
    val guard = if (ifNotExists) "IF NOT EXISTS " else ""
    spark.sql(s"CREATE DATABASE $guard${quote(name)}")
  }

  def dropSchema(spark: SparkSession, name: String,
      cascade: Boolean = false): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS ${quote(name)}" +
      (if (cascade) " CASCADE" else ""))

  /** Database-level encryption posture — the engine's analog of the
    * reference's per-database TDE flag (`sys.databases.is_encrypted`,
    * reference: samples/scripts/monitor/transparent_data_encryption/
    * transparent_data_encryption_status.sql:1-9). At-rest encryption in
    * the lake model is a storage-platform property, so the catalog
    * records the declared posture as a database property; the
    * MonitoringViews widget renders it in the reference's exact shape.
    */
  val PropEncryption = "graft.encryption"

  def setEncryption(spark: SparkSession, database: String,
      encrypted: Boolean): Unit =
    spark.sql(s"ALTER DATABASE ${quote(database)} SET DBPROPERTIES " +
      s"('$PropEncryption' = '$encrypted')")

  /** Read a database's declared encryption posture back (false when the
    * property was never set — the reference's default is_encrypted = 0).
    */
  def databaseEncrypted(spark: SparkSession, database: String): Boolean =
    spark.sql(s"DESCRIBE DATABASE EXTENDED ${quote(database)}").collect()
      .exists(r => r.getString(0) == "Properties" &&
        r.getString(1).contains(s"$PropEncryption,true"))

  private def quoteQualified(name: String): String =
    name.split('.').map(quote).mkString(".")

  /** TRUNCATE TABLE (SURVEY.md §2.1 S6; reference:
    * samples/scripts/data-load/GenerateLoadScript-V1.sql:87 — the
    * per-iteration work-table reset). Metadata-only on managed parquet
    * tables: Spark drops the table's files/partitions without touching the
    * catalog entry, the same contract as the reference's TRUNCATE.
    */
  def truncateTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"TRUNCATE TABLE ${quoteQualified(table)}")

  /** DROP TABLE (SURVEY.md §2.1 S7; reference:
    * samples/scripts/data-load/GenerateLoadScript-V1.sql:134-153 — cleanup
    * between load iterations). `ifExists` mirrors the reference's
    * OBJECT_ID-guarded conditional drop, making cleanup loops idempotent.
    */
  def dropTable(spark: SparkSession, table: String,
      ifExists: Boolean = true): Unit = {
    val guard = if (ifExists) "IF EXISTS " else ""
    spark.sql(s"DROP TABLE $guard${quoteQualified(table)}")
  }

  /** DROP VIEW — the external-object cleanup companion
    * (reference: GenerateLoadScript-V1.sql:134-153 drops the external
    * table/data source pair; our external scans are unmanaged, so the
    * cataloged artifact to drop is the view layer).
    */
  def dropView(spark: SparkSession, view: String,
      ifExists: Boolean = true): Unit = {
    val guard = if (ifExists) "IF EXISTS " else ""
    spark.sql(s"DROP VIEW $guard${quoteQualified(view)}")
  }

  private def sqlType(dt: DataType): String = dt.sql

  def createTableStatement(spark: SparkSession, table: String): String = {
    val df = spark.table(table)
    val colDefs = df.schema.fields.map { f =>
      val nullability = if (f.nullable) "" else " NOT NULL"
      s"  ${quote(f.name)} ${sqlType(f.dataType)}$nullability"
    }.mkString(",\n")
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val policy = Seq(
      props.get(TablePolicy.PropDistribution).map(d => s"DISTRIBUTION = $d"),
      props.get(TablePolicy.PropLayout).map(l => s"LAYOUT = $l"),
      props.get(TablePolicy.PropPartition).map(p => s"PARTITION = $p")).flatten
    val withClause =
      if (policy.isEmpty) "" else policy.mkString(" WITH (", ", ", ")")
    s"CREATE TABLE ${quote(table)} (\n$colDefs\n) USING parquet$withClause"
  }

  /** Reconstruct a CREATE VIEW statement from the catalog — the
    * `sys.sql_modules.definition` extraction the deployment tooling uses
    * (reference:
    * samples/scripts/deployments/GetCreateStatement_Function_Proc_View.sql:104-108).
    */
  def createViewStatement(spark: SparkSession, view: String): String = {
    val rows = spark.sql(s"SHOW CREATE TABLE ${quoteQualified(view)}").collect()
    rows(0).getString(0)
  }

  /** Schema-diff → ALTER TABLE ADD COLUMNS, the catalog-diffing deployment
    * pattern (reference: samples/scripts/deployments/AddTableChanges.sql:62-98):
    * the anti-join of desired columns against current ones.
    */
  def addColumnChanges(spark: SparkSession, table: String,
      desired: StructType): Seq[String] = {
    val current = spark.table(table).schema.fieldNames.map(_.toLowerCase).toSet
    val missing = desired.fields.filterNot(f => current(f.name.toLowerCase))
    if (missing.isEmpty) Seq.empty
    else Seq(s"ALTER TABLE ${quote(table)} ADD COLUMNS (" +
      missing.map(f => s"${quote(f.name)} ${sqlType(f.dataType)}").mkString(", ") +
      ")")
  }
}
