package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator — the WWI `Dimension.Date` table (reference:
  * samples/databases/wide-world-importers/tables/dimension.date.sql:1-24):
  * one row per calendar day with the calendar and fiscal attribute ladder.
  * Generated distributively from `sequence()` (no driver loop), so a
  * century-scale dimension builds in one job; fiscal year starts in November
  * like the WWI sample.
  */
object DateDim {

  def build(spark: SparkSession, startDate: String, endDate: String,
      fiscalStartMonth: Int = 11): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        lit(startDate).cast("date"), lit(endDate).cast("date"),
        expr("interval 1 day"))).as("Date"))
    val fiscalShift = 12 - fiscalStartMonth + 1 // months to add to align FY
    val fiscalDate = add_months(col("Date"), fiscalShift)
    days.select(
      col("Date"),
      dayofmonth(col("Date")).as("Day Number"),
      date_format(col("Date"), "d").as("Day"),
      date_format(col("Date"), "MMMM").as("Month"),
      date_format(col("Date"), "MMM").as("Short Month"),
      month(col("Date")).as("Calendar Month Number"),
      concat(lit("CY"), year(col("Date")), lit("-"),
        date_format(col("Date"), "MMM")).as("Calendar Month Label"),
      year(col("Date")).as("Calendar Year"),
      concat(lit("CY"), year(col("Date"))).as("Calendar Year Label"),
      month(fiscalDate).as("Fiscal Month Number"),
      concat(lit("FY"), year(fiscalDate), lit("-"),
        date_format(col("Date"), "MMM")).as("Fiscal Month Label"),
      year(fiscalDate).as("Fiscal Year"),
      concat(lit("FY"), year(fiscalDate)).as("Fiscal Year Label"),
      dayofweek(col("Date")).as("Day of Week"),
      quarter(col("Date")).as("Calendar Quarter"))
  }
}
