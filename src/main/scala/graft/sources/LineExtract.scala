package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic line extractor (SURVEY.md §2.1 S9) — print N lines at an offset
  * from a huge text file, the PolyBase-failure triage utility (reference:
  * samples/utility/Extract/extract/Program.cs:19-92). Distributed line
  * numbering via zipWithIndex (no driver-side scan of the prefix).
  */
object LineExtract {
  def lines(spark: SparkSession, path: String, offset: Long,
      count: Int): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .filter { case (_, i) => i >= offset && i < offset + count }
      .map { case (l, i) => (i + 1, l) }
      .toDF("line_number", "line")
  }
}
