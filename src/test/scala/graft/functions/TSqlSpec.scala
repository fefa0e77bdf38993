package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** T-SQL semantic edge cases (SURVEY.md §7.4 risk 1): boundary-crossing
  * DATEDIFF, calendar DATEADD with clamping, LEN trailing spaces, QUOTENAME
  * escaping, CHARINDEX absence, LEFT/RIGHT overlong, NULL composites.
  */
class TSqlSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(colExpr.as("r")).collect()(0).get(0)

  test("DATEDIFF counts unit-boundary crossings, not elapsed time") {
    val a = lit("2023-12-31 23:59:59").cast("timestamp")
    val b = lit("2024-01-01 00:00:00").cast("timestamp")
    assert(one(TSql.datediff("year", a, b)) === 1L)
    assert(one(TSql.datediff("quarter", a, b)) === 1L)
    assert(one(TSql.datediff("month", a, b)) === 1L)
    assert(one(TSql.datediff("day", a, b)) === 1L)
    assert(one(TSql.datediff("hour", a, b)) === 1L)
    assert(one(TSql.datediff("minute", a, b)) === 1L)
    assert(one(TSql.datediff("second", a, b)) === 1L)
    // elapsed is 1s but two whole days apart crosses 1 boundary only
    val c = lit("2024-01-02 23:59:59").cast("timestamp")
    assert(one(TSql.datediff("day", b, c)) === 1L)
  }

  test("DATEDIFF week counts Sunday-start boundaries") {
    // 2024-01-06 was a Saturday, 2024-01-07 a Sunday.
    val sat = lit("2024-01-06 12:00:00").cast("timestamp")
    val sun = lit("2024-01-07 00:00:00").cast("timestamp")
    assert(one(TSql.datediff("week", sat, sun)) === 1L)
    val mon = lit("2024-01-08 00:00:00").cast("timestamp")
    assert(one(TSql.datediff("week", sun, mon)) === 0L)
  }

  test("DATEADD month clamps to month end and keeps time-of-day") {
    val jan31 = lit("2024-01-31 10:30:00").cast("timestamp")
    assert(one(TSql.dateadd("month", 1, jan31)).toString
      === "2024-02-29 10:30:00.0")
    assert(one(TSql.dateadd("year", 1, jan31)).toString
      === "2025-01-31 10:30:00.0")
    assert(one(TSql.dateadd("hour", -11, jan31)).toString
      === "2024-01-30 23:30:00.0")
  }

  test("LEN ignores trailing spaces only") {
    assert(one(TSql.len(lit("ab  "))) === 2)
    assert(one(TSql.len(lit("  ab"))) === 4)
    assert(one(TSql.len(lit(""))) === 0)
  }

  test("QUOTENAME doubles closing brackets") {
    assert(one(TSql.quotename(lit("a]b"))) === "[a]]b]")
    assert(one(TSql.quotename(lit("plain"))) === "[plain]")
  }

  test("CHARINDEX is 1-based, 0 when absent") {
    assert(one(TSql.charindex(lit("b"), lit("abc"))) === 2)
    assert(one(TSql.charindex(lit("z"), lit("abc"))) === 0)
  }

  test("LEFT/RIGHT tolerate n longer than the string") {
    assert(one(TSql.left(lit("abc"), 10)) === "abc")
    assert(one(TSql.right(lit("abc"), 10)) === "abc")
    assert(one(TSql.right(lit("abcdef"), 2)) === "ef")
  }

  test("ISNULL / NULLIF / modSafe") {
    assert(one(TSql.isnull(lit(null).cast("int"), lit(7))) === 7)
    assert(one(TSql.nullif(lit(5), lit(5))) === null)
    assert(one(TSql.nullif(lit(5), lit(4))) === 5)
    assert(one(TSql.modSafe(lit(10), lit(0))) === null)
    assert(one(TSql.modSafe(lit(10), lit(3))) === 1)
  }

  test("math composite ladder matches java.lang.Math semantics") {
    import org.apache.spark.sql.functions._
    def d(c: org.apache.spark.sql.Column): Double =
      one(c).asInstanceOf[Double]
    assert(math.abs(d(TSql.degrees(lit(math.Pi))) - 180.0) < 1e-12)
    assert(math.abs(d(TSql.radians(lit(180.0))) - math.Pi) < 1e-15)
    assert(math.abs(d(TSql.atn2(lit(1.0), lit(1.0))) - math.Pi / 4) < 1e-15)
    assert(math.abs(d(TSql.acosh(lit(2.0))) - 1.3169578969248166) < 1e-12)
    assert(math.abs(d(TSql.asinh(lit(1.0))) - 0.881373587019543) < 1e-12)
    assert(math.abs(d(TSql.atanh(lit(0.5))) - 0.5493061443340549) < 1e-12)
    assert(one(TSql.quotient(lit(17), lit(5))) === 3L)
    assert(one(TSql.quotient(lit(17), lit(0))) === null)
    assert(one(TSql.truncNum(lit(-2.789), 2)) === -2.78)
    val rb = one(TSql.randbetween(5, 9, seed = 1)).asInstanceOf[Int]
    assert(rb >= 5 && rb <= 9)
  }

  test("InverseFisher composite equals tanh; Standardize guards stdev<=0") {
    import org.apache.spark.sql.functions._
    val x = 0.42
    val got = one(TSql.inverseFisher(lit(x))).asInstanceOf[Double]
    assert(math.abs(got - math.tanh(x)) < 1e-15)
    assert(one(TSql.standardize(lit(5.0), lit(3.0), lit(2.0))) === 1.0)
    assert(one(TSql.standardize(lit(5.0), lit(3.0), lit(0.0))) === null)
  }

  test("moneyString renders negative cents with a single sign") {
    assert(one(TSql.moneyString(lit(12345L))) === "123.45")
    assert(one(TSql.moneyString(lit(-12345L))) === "-123.45")
    assert(one(TSql.moneyString(lit(-5L))) === "-0.05")
    assert(one(TSql.moneyString(lit(0L))) === "0.00")
    assert(one(TSql.moneyString(lit(-100L))) === "-1.00")
  }

  test("initcapFirst only capitalizes the first character") {
    assert(one(TSql.initcapFirst(lit("hello world"))) === "Hello world")
  }

  test("case-insensitive comparison helpers match T-SQL default collation") {
    assert(one(TSql.ciEquals(lit("Hello"), lit("hELLo"))) === true)
    assert(one(TSql.ciEquals(lit("Hello"), lit("world"))) === false)
    assert(one(TSql.ciLike(lit("WareHouse"), "ware%")) === true)
  }

  test("DATEPART weekday is 1=Sunday..7=Saturday") {
    val sun = lit("2024-01-07 00:00:00").cast("timestamp")
    assert(one(TSql.datepart("weekday", sun)) === 1)
    val sat = lit("2024-01-06 00:00:00").cast("timestamp")
    assert(one(TSql.datepart("weekday", sat)) === 7)
  }

  test("phoneticKey matches classic soundex (minus the H/W-transparency rule)") {
    assert(one(TSql.phoneticKey(lit("Robert"))) === "R163")
    assert(one(TSql.phoneticKey(lit("Rupert"))) === "R163")
    assert(one(TSql.phoneticKey(lit("Tymczak"))) === "T522")
    // classic-with-H/W gives A261; the portable variant keeps S,C split
    assert(one(TSql.phoneticKey(lit("Ashcraft"))) === "A226")
    assert(one(TSql.phoneticKey(lit("Pfister"))) === "P236")
    // short names zero-pad; non-letters strip before coding
    assert(one(TSql.phoneticKey(lit("Lee"))) === "L000")
    assert(one(TSql.phoneticKey(lit("O'Brien"))) === "O165")
    assert(one(TSql.phoneticKey(lit("A"))) === "A000")
  }

  test("phoneticDifference counts agreeing key positions") {
    def diff(a: String, b: String) =
      one(TSql.phoneticDifference(TSql.phoneticKey(lit(a)),
        TSql.phoneticKey(lit(b))))
    assert(diff("Robert", "Rupert") === 4L)
    assert(diff("Robert", "Robertson") === 4L) // both truncate to R163
    assert(diff("Green", "Blotchet") === 0L) // G650 vs B432
  }
}
