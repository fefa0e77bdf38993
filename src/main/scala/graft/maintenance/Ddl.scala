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

  private def quote(id: String): String = s"`${id.replace("`", "``")}`"

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
