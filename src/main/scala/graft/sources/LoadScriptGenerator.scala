package graft.sources

import graft.catalog.{Distribution, TablePolicy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Catalog-driven load-script generator — the engine's analog of the
  * reference's GenerateLoadScript loop (reference:
  * samples/scripts/data-load/GenerateLoadScript-V1.sql:61-153,
  * GenerateLoadScript-V2.sql:130-168): enumerate the tables of a source
  * schema and, per table,
  *
  *  1. emit the external-table DDL built column-by-column from the catalog
  *     schema (V1:90-127's type ladder),
  *  2. emit the CTAS statement carrying the table's distribution policy and
  *     a `CTAS : Load [schema].[table]` label (V1:141-142),
  *  3. execute the load through the Spark path: reject-accounted external
  *     scan → V2 cast/clean projection → policy-honoring CTAS,
  *  4. report the row count + elapsed time the reference echoes after each
  *     iteration (V1:156, 186-187).
  *
  * The emitted DDL strings are the observable "script" (the reference PRINTs
  * them in 1000-char chunks before EXEC); execution is native DataFrame code.
  */
object LoadScriptGenerator {

  /** One source-schema table: where its delimited files live, its target
    * schema, and the physical policy of the warehouse table to create.
    */
  final case class SourceTable(
      name: String,
      location: String,
      schema: StructType,
      format: ExternalFileFormat = ExternalFileFormat(),
      reject: RejectType = RejectType.Value(0),
      policy: TablePolicy = TablePolicy(),
      clean: CastClean.Options = CastClean.Options())

  final case class LoadReport(table: String, rows: Long, elapsedMs: Long,
      externalDdl: String, ctasSql: String)

  /** T-SQL type rendering for the DDL echo (inverse of the SURVEY §1.2 type
    * mapping; V1:104-113's ladder).
    */
  def sqlTypeName(f: StructField): String = {
    val base = f.dataType match {
      case LongType => "bigint"
      case IntegerType => "int"
      case ShortType => "smallint"
      case ByteType => "tinyint"
      case BooleanType => "bit"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case DoubleType => "float(53)"
      case FloatType => "real"
      case StringType => "nvarchar(4000)"
      case TimestampType => "datetime2(6)"
      case DateType => "date"
      case BinaryType => "varbinary(max)"
      case other => other.simpleString
    }
    s"[${f.name}] $base" + (if (f.nullable) " NULL" else " NOT NULL")
  }

  /** CREATE EXTERNAL TABLE DDL for the table (V1:99-127 shape). */
  def externalDdl(t: SourceTable): String = {
    val cols = t.schema.fields.map(sqlTypeName).mkString(", ")
    val rejectClause = t.reject match {
      case RejectType.Value(n) => s"REJECT_TYPE = VALUE, REJECT_VALUE = $n"
      case RejectType.Percentage(p) =>
        s"REJECT_TYPE = PERCENTAGE, REJECT_VALUE = $p"
    }
    s"CREATE EXTERNAL TABLE [ASB].[${t.name}] ($cols) WITH " +
      s"(LOCATION='${t.location}', DATA_SOURCE = AzureStorage, " +
      s"FILE_FORMAT = TextFileFormat, $rejectClause);"
  }

  /** CTAS DDL with the distribution policy (V1:141-142 shape). */
  def ctasSql(t: SourceTable, targetSchema: String): String = {
    val dist = t.policy.distribution match {
      case Distribution.Hash(c, _) => s"HASH([$c])"
      case Distribution.Replicate => "REPLICATE"
      case Distribution.RoundRobin => "ROUND_ROBIN"
    }
    s"CREATE TABLE [$targetSchema].[${t.name}] WITH (DISTRIBUTION = $dist) " +
      s"AS SELECT * FROM [ASB].[${t.name}] " +
      s"OPTION (LABEL = 'CTAS : Load [$targetSchema].[${t.name}]');"
  }

  /** Run the whole loop: per table, print-equivalent DDL is returned in the
    * report and the load executes through scan → cast/clean → CTAS.
    */
  def loadAll(spark: SparkSession, tables: Seq[SourceTable],
      targetSchema: String = "dw"): Seq[LoadReport] = tables.map { t =>
    val start = System.nanoTime()
    // the external scan reads raw text columns; typing happens in the
    // cast/clean projection exactly as V2's CTAS does
    val rawSchema = StructType(t.schema.fields.map(f =>
      StructField(f.name, StringType, nullable = true)))
    val raw = ExternalTable(t.location, rawSchema, t.format, t.reject)
      .read(spark)
    val cleaned = CastClean(raw, t.schema, t.clean)
    val target = s"${targetSchema}_${t.name}"
    if (spark.catalog.tableExists(target)) spark.sql(s"DROP TABLE $target")
    Ctas.create(spark, cleaned, target, t.policy,
      label = Some(s"CTAS : Load [$targetSchema].[${t.name}]"))
    val rows = spark.table(target).count() // COUNT_BIG echo (V1:156)
    LoadReport(target, rows, (System.nanoTime() - start) / 1000000L,
      externalDdl(t), ctasSql(t, targetSchema))
  }

  // ------------------- V3: container-subfolders variant

  /** The V3 loop's whole-run output: the ONE data-source DDL emitted up
    * front, plus per-table reports whose external DDL carries the
    * subfolder LOCATION template and whose drop DDL records the V3
    * cleanup step.
    */
  final case class SubfolderLoad(dataSourceDdl: String,
      reports: Seq[LoadReport], dropDdls: Seq[String])

  /** The once-per-run external data source rooted at the CONTAINER
    * (reference: GenerateLoadScript-V3-ContainerSubfolders.sql:77-80 —
    * "create the external data source (once - since all files are in
    * 'subfolders')"). V1/V2 bind a data source per location; V3's one
    * source + relative LOCATIONs is the layout a per-table-folder
    * container uses.
    */
  def dataSourceDdl(container: String): String =
    s"CREATE EXTERNAL DATA SOURCE AzureStorage2 WITH (TYPE = HADOOP, " +
      s"LOCATION = '$container', CREDENTIAL = AzureStorageCredential);"

  /** The V3 per-table LOCATION: '/<schema>/<table>/' (reference:
    * GenerateLoadScript-V3-ContainerSubfolders.sql:117).
    */
  def subfolderLocation(sourceSchema: String, table: String): String =
    s"/$sourceSchema/$table/"

  /** CREATE EXTERNAL TABLE DDL in the V3 shape: subfolder LOCATION
    * relative to the shared container source (not an absolute per-table
    * path), DATA_SOURCE = AzureStorage2.
    */
  def externalDdlSubfolder(t: SourceTable, sourceSchema: String): String = {
    val cols = t.schema.fields.map(sqlTypeName).mkString(", ")
    val rejectClause = t.reject match {
      case RejectType.Value(n) => s"REJECT_TYPE = VALUE, REJECT_VALUE = $n"
      case RejectType.Percentage(p) =>
        s"REJECT_TYPE = PERCENTAGE, REJECT_VALUE = $p"
    }
    s"CREATE EXTERNAL TABLE [ASB].[${t.name}] ($cols) WITH " +
      s"(LOCATION='${subfolderLocation(sourceSchema, t.name)}', " +
      s"DATA_SOURCE = AzureStorage2, FILE_FORMAT = TextFileFormat, " +
      s"$rejectClause);"
  }

  /** The V3 container-subfolders loop (reference:
    * samples/scripts/data-load/GenerateLoadScript-V3-ContainerSubfolders.sql:1):
    * one external data source rooted at `containerRoot` is declared up
    * front, every table reads from the DERIVED subfolder
    * `containerRoot/<sourceSchema>/<table>/` (each SourceTable's own
    * `location` is ignored — the template IS the variant), and after each
    * load the external table is dropped (V3's per-iteration cleanup,
    * recorded as drop DDL; the Spark scan holds no persistent external
    * object, so the echo is the whole analog).
    */
  def loadAllSubfolders(spark: SparkSession, containerRoot: String,
      sourceSchema: String, tables: Seq[SourceTable],
      targetSchema: String = "dw"): SubfolderLoad = {
    val derived = tables.map { t =>
      t.copy(location = containerRoot.stripSuffix("/") +
        subfolderLocation(sourceSchema, t.name))
    }
    val reports = loadAll(spark, derived, targetSchema).zip(tables).map {
      case (r, t) =>
        r.copy(externalDdl = externalDdlSubfolder(t, sourceSchema))
    }
    SubfolderLoad(dataSourceDdl(containerRoot), reports,
      tables.map(t => s"DROP EXTERNAL TABLE [ASB].[${t.name}]"))
  }
}
