package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The typed-cast / cleanup projection applied between external scan and CTAS
  * — the V2 load pipeline semantics (reference:
  * samples/scripts/data-load/GenerateLoadScript-V2.sql:139-168):
  *
  *  - literal "null" strings → NULL
  *  - un-quote values wrapped in string delimiters
  *  - CR/LF substitution characters → real CR/LF (the loader writes
  *    placeholders because PolyBase text rows are line-delimited; the same
  *    trick as DBLoader's CR/LF substitution knobs, reference:
  *    samples/utility/DBLoader/DBLoader/Globals.cs:80-98)
  *  - datetime floor repair: DATETIME below 1753-01-01 (or SMALLDATETIME below
  *    1900-01-01) is clamped, as DBLoader's fix-dates mode does (reference:
  *    DBLoader/InputFile.cs:215)
  *  - NOT NULL columns get ISNULL defaults
  */
object CastClean {

  val DatetimeFloor = "1753-01-01 00:00:00"
  val SmalldatetimeFloor = "1900-01-01 00:00:00"

  final case class Options(
      nullLiteral: String = "null",
      crSubstitute: Option[String] = None,
      lfSubstitute: Option[String] = None,
      fixDates: Boolean = true,
      notNullDefaults: Map[String, Column] = Map.empty)

  /** Build the cleaned, typed column for one target field from its raw string
    * column (pure expression composition — stays in codegen).
    */
  def cleanColumn(raw: Column, target: StructField, opts: Options): Column = {
    var c = raw.cast(StringType)
    c = when(c === lit(opts.nullLiteral), lit(null)).otherwise(c)
    opts.crSubstitute.foreach(s => c = regexp_replace(c, lit(s), lit("\r")))
    opts.lfSubstitute.foreach(s => c = regexp_replace(c, lit(s), lit("\n")))
    var typed = c.cast(target.dataType)
    if (opts.fixDates && target.dataType == TimestampType) {
      val floor = lit(DatetimeFloor).cast(TimestampType)
      typed = when(typed < floor, floor).otherwise(typed)
    }
    if (!target.nullable) {
      val dflt = opts.notNullDefaults.getOrElse(target.name,
        defaultFor(target.dataType))
      typed = coalesce(typed, dflt)
    }
    typed.as(target.name)
  }

  private def defaultFor(dt: DataType): Column = dt match {
    case StringType => lit("")
    case TimestampType => lit(DatetimeFloor).cast(TimestampType)
    case DateType => lit("1753-01-01").cast(DateType)
    case _: NumericType => lit(0).cast(dt)
    case BooleanType => lit(false)
    case other => lit(null).cast(other)
  }

  /** Apply the pipeline to a whole raw (all-string) frame, producing the
    * target schema.
    */
  def apply(raw: DataFrame, target: StructType,
      opts: Options = Options()): DataFrame =
    raw.select(target.fields.map(f => cleanColumn(raw(f.name), f, opts)): _*)
}
