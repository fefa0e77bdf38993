package graft.observability

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The task-grain skew monitor flags one-hot-key stages from real task
  * metrics — and stays quiet on evenly keyed work.
  */
class TaskSkewSpec extends SparkSpec {

  // AQE coalesces this test's byte-tiny shuffles into ONE task, hiding the
  // row spread (at real scale the hot task exceeds the advisory partition
  // size, so coalescing keeps the spread visible) — pin partition widths
  // for the fixture
  private def skewOf(df: => org.apache.spark.sql.DataFrame,
      minRows: Long, ratio: Double): Seq[PlanLint.Finding] = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    val l = new TaskSkewListener
    spark.sparkContext.addSparkListener(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      assert(org.apache.spark.graft.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 10000L), "bus must drain")
      l.drain(minRows, ratio)
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.conf.set(key, saved)
    }
  }

  test("flags a hot-key window stage and resets after drain") {
    import spark.implicits._
    // 50k rows on ONE key, 500 spread across 500 others: the window
    // shuffle hands ~99% of the stream to a single task
    def df = (1 to 50500).map(i =>
      (if (i <= 50000) 0L else i.toLong % 500, i.toLong)).toDF("k", "v")
      .repartition(8)
      .withColumn("r", sum(col("v"))
        .over(Window.partitionBy(col("k")).orderBy(col("v"))))
    val found = skewOf(df, 10000L, 8.0)
    assert(found.exists(_.rule == "task-skew"),
      s"hot-key stage must flag, got $found")
  }

  test("the byte floor silences coalescing-artifact row imbalance") {
    import spark.implicits._
    // same hot-key shape, but judged with a bench-default byte floor: a
    // 50k-row long column is ~1 MB — the AQE-coalescing regime where row
    // ratios are meaningless — so the rule must stay quiet
    def df = (1 to 50500).map(i =>
      (if (i <= 50000) 0L else i.toLong % 500, i.toLong)).toDF("k", "v")
      .repartition(8)
      .withColumn("r", sum(col("v"))
        .over(Window.partitionBy(col("k")).orderBy(col("v"))))
    val l = new TaskSkewListener
    spark.sparkContext.addSparkListener(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      assert(org.apache.spark.graft.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 10000L))
      assert(l.drain(10000L, 8.0, 32L * 1024 * 1024).isEmpty,
        "byte-tiny stages must not flag under the byte floor")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("stays quiet on evenly keyed shuffles at the same thresholds") {
    import spark.implicits._
    val even = (1 to 50500).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .repartition(8)
      .withColumn("r", sum(col("v"))
        .over(Window.partitionBy(col("k")).orderBy(col("v"))))
    assert(skewOf(even, 10000L, 8.0).isEmpty)
  }
}
