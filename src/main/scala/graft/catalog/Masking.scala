package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic-data-masking analog: the SQL-warehouse pattern of publishing ONE
  * logical view whose sensitive columns render masked unless the reader
  * holds an unmasking role (SQL Server DDM's `MASKED WITH (FUNCTION = ...)`
  * + `GRANT UNMASK`). Spark sessions carry no database principal, so the
  * reader principal binds at VIEW CREATION — each consumer (a service
  * account, a notebook user) gets its own registered view, which is also
  * how a lake deployment actually ships per-audience views.
  *
  * Mask functions mirror the reference surface and stay deterministic:
  *  - `default`: type-appropriate constant (xxxx / 0 / 1900-01-01)
  *  - `email`: first character + "xxx@xxxx.com"
  *  - `partial:p:s`: keep p leading and s trailing characters, pad "xxxx"
  *    between (strings only; shorter values mask fully)
  *
  * Masking happens in the projection — a Column expression per masked
  * field, codegen-friendly, no UDF — so predicate pushdown and pruning on
  * unmasked columns are unaffected.
  */
object Masking {

  private def maskedColumn(c: Column, dt: DataType, kind: String): Column =
    kind match {
      case "default" => dt match {
        case StringType => lit("xxxx")
        case _: NumericType => lit(0).cast(dt)
        case DateType => lit("1900-01-01").cast(DateType)
        case TimestampType => lit("1900-01-01 00:00:00").cast(TimestampType)
        case _ => lit(null).cast(dt)
      }
      case "email" =>
        concat(substring(c.cast(StringType), 1, 1), lit("xxx@xxxx.com"))
      case p if p.startsWith("partial:") =>
        val Array(_, pre, suf) = p.split(":", 3)
        val (np, ns) = (pre.toInt, suf.toInt)
        when(length(c.cast(StringType)) <= np + ns, lit("xxxx"))
          .otherwise(concat(
            substring(c.cast(StringType), 1, np), lit("xxxx"),
            substring(c.cast(StringType), -ns, ns)))
      case other =>
        throw new IllegalArgumentException(s"unknown mask function '$other'")
    }

  /** Apply `masks` (column → mask kind) to `df` unless `principal` reaches
    * any of `unmaskRoles` (transitively) in `sec`.
    */
  def maskedFrame(sec: Security, df: DataFrame, masks: Map[String, String],
      unmaskRoles: Set[String], principal: String): DataFrame = {
    val unmasked = unmaskRoles.exists(r => sec.isMemberTransitive(r, principal))
    if (unmasked) df
    else {
      val byName = df.schema.map(f => f.name -> f.dataType).toMap
      masks.foldLeft(df) { case (acc, (name, kind)) =>
        val dt = byName.getOrElse(name,
          throw new IllegalArgumentException(s"no column '$name'"))
        acc.withColumn(name, maskedColumn(col(name), dt, kind))
      }
    }
  }

  /** CREATE VIEW <viewName> FOR <principal>: register the per-audience
    * masked (or clear, if privileged) projection of `sourceTable`.
    */
  def createMaskedView(spark: SparkSession, sec: Security, sourceTable: String,
      masks: Map[String, String], viewName: String,
      unmaskRoles: Set[String], principal: String): Unit =
    maskedFrame(sec, spark.table(sourceTable), masks, unmaskRoles, principal)
      .createOrReplaceTempView(viewName)
}
