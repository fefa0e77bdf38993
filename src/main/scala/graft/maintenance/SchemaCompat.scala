package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-evolution compatibility audit: given a table's schema before and
  * after a proposed change, classify every difference the way a lake
  * governance gate needs — can OLD data still be read under the NEW schema
  * (backward), can old readers survive the new files (forward), or is the
  * change breaking? This is the pre-deployment check in front of
  * `Ddl.addColumnChanges` (which applies additive sync): sync applies
  * changes, this decides whether they're safe to apply.
  *
  * Classification rules (parquet-on-lake semantics):
  *  - added nullable column        → compatible (old files read as NULL)
  *  - added non-nullable column    → breaking (old files cannot supply it)
  *  - dropped column               → breaking for readers that project it
  *  - widened numeric type (int→long, int/long→double, float→double)
  *                                 → compatible (lossless upcast on read)
  *  - any other type change        → breaking
  *  - required → nullable          → compatible (strictly more permissive)
  *  - nullable → required          → breaking (old NULLs violate it)
  */
object SchemaCompat {

  final case class SchemaChange(column: String, change: String,
      before: String, after: String, compatibility: String)

  private val Widenings: Set[(DataType, DataType)] = Set(
    (IntegerType, LongType), (IntegerType, DoubleType),
    (LongType, DoubleType), (FloatType, DoubleType),
    (ShortType, IntegerType), (ShortType, LongType), (ByteType, ShortType),
    (ByteType, IntegerType), (ByteType, LongType))

  def diff(before: StructType, after: StructType): Seq[SchemaChange] = {
    val b = before.fields.map(f => f.name -> f).toMap
    val a = after.fields.map(f => f.name -> f).toMap
    val added = after.fields.filterNot(f => b.contains(f.name)).map { f =>
      SchemaChange(f.name, "added", "", f.dataType.simpleString,
        if (f.nullable) "compatible" else "breaking")
    }
    val dropped = before.fields.filterNot(f => a.contains(f.name)).map { f =>
      SchemaChange(f.name, "dropped", f.dataType.simpleString, "", "breaking")
    }
    val changed = before.fields.filter(f => a.contains(f.name)).flatMap { f =>
      val nf = a(f.name)
      val typeChange =
        if (f.dataType == nf.dataType) None
        else Some(SchemaChange(f.name, "type_changed",
          f.dataType.simpleString, nf.dataType.simpleString,
          if (Widenings.contains((f.dataType, nf.dataType))) "compatible"
          else "breaking"))
      val nullChange =
        if (f.nullable == nf.nullable) None
        else Some(SchemaChange(f.name,
          if (nf.nullable) "made_nullable" else "made_required",
          f.nullable.toString, nf.nullable.toString,
          if (nf.nullable) "compatible" else "breaking"))
      typeChange.toSeq ++ nullChange
    }
    (added ++ dropped ++ changed).sortBy(c => (c.column, c.change))
  }

  /** The audit as a DataFrame plus the gate verdict: deployable iff no
    * breaking change.
    */
  def report(spark: SparkSession, before: StructType,
      after: StructType): DataFrame = {
    import spark.implicits._
    diff(before, after).toDF()
  }

  def isDeployable(before: StructType, after: StructType): Boolean =
    diff(before, after).forall(_.compatibility == "compatible")
}
