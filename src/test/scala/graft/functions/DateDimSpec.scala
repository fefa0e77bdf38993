package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DateDimSpec extends SparkSpec {

  test("date dimension covers the range with correct calendar/fiscal attrs") {
    val d = DateDim.build(spark, "2023-01-01", "2024-12-31")
    assert(d.count() === 731) // 2023 + leap 2024
    val nov1 = d.filter(col("Date") === lit("2024-11-01").cast("date")).collect()(0)
    assert(nov1.getAs[Int]("Calendar Year") === 2024)
    assert(nov1.getAs[Int]("Fiscal Year") === 2025)   // FY starts in November
    assert(nov1.getAs[Int]("Fiscal Month Number") === 1)
    val oct31 = d.filter(col("Date") === lit("2024-10-31").cast("date")).collect()(0)
    assert(oct31.getAs[Int]("Fiscal Year") === 2024)
    assert(oct31.getAs[Int]("Fiscal Month Number") === 12)
    val feb29 = d.filter(col("Date") === lit("2024-02-29").cast("date"))
    assert(feb29.count() === 1)
    assert(feb29.collect()(0).getAs[String]("Calendar Month Label") === "CY2024-Feb")
    // unique, dense day coverage
    assert(d.select("Date").distinct().count() === 731)
  }
}
