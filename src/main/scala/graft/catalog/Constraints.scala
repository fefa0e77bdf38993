package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Informational constraint declarations — the engine's `RELY` surface.
  * The reference's dedicated-pool dialect (like every MPP warehouse)
  * accepts NOT ENFORCED constraints precisely so the optimizer can use
  * them; here a declared FK lives as child-table TBLPROPERTIES that
  * [[graft.plans.FkJoinEliminationRule]] reads to drop provably redundant
  * dimension joins.
  */
object Constraints {

  def fkProp(col: String): String = s"graft.fk.$col"
  def fkNotNullProp(col: String): String = s"graft.fk.$col.notnull"

  /** Containment check backing a declaration — the q219 shape: every
    * distinct child key must exist in the parent. Run it before declaring
    * (`validate = true`) or skip it and carry the RELY obligation.
    */
  def validateFk(spark: SparkSession, childTable: String, fkCol: String,
      parentTable: String, parentKey: String): Boolean = {
    val orphans = spark.table(childTable).select(col(fkCol).as("v"))
      .filter(col("v").isNotNull).distinct()
      .join(spark.table(parentTable).select(col(parentKey).as("v")).distinct(),
        Seq("v"), "left_anti")
      .limit(1).count()
    orphans == 0L
  }

  /** Catalog view of every declared FK — the sys.foreign_keys analog: one
    * row per (child_table, fk_column) with its parent, key, and the
    * non-null assertion. Driver-side catalog enumeration (metadata-scale,
    * like every monitoring view's control-plane read).
    */
  def foreignKeys(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val FkRe = """graft\.fk\.([^.]+)""".r
    val rows = spark.catalog.listTables().collect().toSeq
      .filter(_.tableType == "MANAGED")
      .flatMap { t =>
        val props = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t.name))
          .properties
        props.toSeq.collect {
          case (FkRe(c), target) if !c.endsWith(".notnull") &&
            target.contains(".") =>
            val Array(pt, pk) = target.split("\\.", 2)
            (t.name, c, pt, pk,
              props.get(fkNotNullProp(c)).contains("true"))
        }
      }
    rows.toDF("child_table", "fk_column", "parent_table", "parent_key",
      "not_null")
  }

  /** Declare child.fkCol → parent.parentKey. With `validate = true` the
    * declaration only lands if containment holds (returns whether it
    * landed). `notNull` additionally asserts the FK column carries no
    * nulls — required for inner-join elimination when the column's schema
    * nullability is loose.
    */
  def declareFk(spark: SparkSession, childTable: String, fkCol: String,
      parentTable: String, parentKey: String, notNull: Boolean = true,
      validate: Boolean = true): Boolean = {
    if (validate &&
      !validateFk(spark, childTable, fkCol, parentTable, parentKey))
      return false
    if (validate && notNull &&
      spark.table(childTable).filter(col(fkCol).isNull).limit(1).count() > 0)
      return false
    val props = Seq(s"'${fkProp(fkCol)}'='$parentTable.$parentKey'") ++
      (if (notNull) Seq(s"'${fkNotNullProp(fkCol)}'='true'") else Nil)
    spark.sql(
      s"ALTER TABLE $childTable SET TBLPROPERTIES(${props.mkString(", ")})")
    true
  }
}
