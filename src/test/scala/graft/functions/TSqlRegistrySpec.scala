package graft.functions

import graft.SparkSpec

/** The T-SQL dialect is reachable from SQL text as native expressions. */
class TSqlRegistrySpec extends SparkSpec {

  test("registered functions evaluate in spark.sql with T-SQL semantics") {
    TSqlRegistry.register(spark)
    val r = spark.sql(
      """SELECT quotename('a]b') AS q,
        |       len('ab  ') AS l,
        |       charindex('b', 'abc') AS c,
        |       isnull(CAST(NULL AS INT), 42) AS i,
        |       tsql_dateadd('month', 1, TIMESTAMP '2024-01-31 10:00:00') AS d,
        |       tsql_datediff('year', TIMESTAMP '2023-12-31 23:59:59',
        |                     TIMESTAMP '2024-01-01 00:00:00') AS y,
        |       tsql_datepart('weekday', TIMESTAMP '2024-01-07 00:00:00') AS dw
        |""".stripMargin).collect()(0)
    assert(r.getString(0) === "[a]]b]")
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 42)
    assert(r.getTimestamp(4).toString === "2024-02-29 10:00:00.0")
    assert(r.getLong(5) === 1L)
    assert(r.getInt(6) === 1)
  }

  test("portable_hash and log2e6 reach SQL text and match their builders") {
    TSqlRegistry.register(spark)
    val r = spark.sql(
      """SELECT log2e6(1) AS l1, log2e6(1024) AS l10,
        |       log2e6(1000000) AS lm,
        |       portable_hash('abc') AS h""".stripMargin).collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 10000000L) // exact power of two
    // within the documented ~0.006-bit truncation of true log2(1e6)
    val ref = math.round(math.log(1e6) / math.log(2) * 1e6)
    assert(math.abs(r.getLong(2) - ref) <= 6000L, s"${r.getLong(2)} vs $ref")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val direct = Seq("abc").toDF("s")
      .select(Text.portableHash(col("s"))).collect()(0).getLong(0)
    assert(r.getLong(3) === direct)
  }

  test("registered functions stay expression-native (no UDF in the plan)") {
    TSqlRegistry.register(spark)
    val plan = spark.sql("SELECT quotename(p_name) FROM parquet.`" +
      s"$sfDir/part.parquet` LIMIT 5").queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      plan)
  }
}
