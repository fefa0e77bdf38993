package graft.fixtures

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Full WWI star fixture: every table builds with its reference policy, the
  * seed-grow loop appends shifted months, a month filter prunes the scanned
  * file set (RANGE RIGHT partition elimination analog), and the
  * hash-distributed facts join collocated — no shuffle on the bucket key
  * (SURVEY.md §2.3 J10).
  */
class WwiStarSpec extends SparkSpec {

  private def scanFileCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    df.collect() // populate metrics
    def plan(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => plan(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(plan) ++
          other.subqueries.flatMap(plan)
      }
    plan(df.queryExecution.executedPlan).map(_.metrics("numFiles").value)
  }

  test("star builds, grows, prunes partitions, and joins without shuffles") {
    val tables = WwiStar.build(spark, sfDir)
    tables.foreach(t => assert(spark.table(t).count() > 0, s"$t is empty"))
    assert(tables.count(_.startsWith("wwi_dimension_")) === 8)
    assert(tables.count(_.startsWith("wwi_fact_")) === 6)

    // seed-grow loop: 3 shifted copies append rows and new month partitions
    val before = spark.table("wwi_fact_sale").count()
    val monthsBefore = spark.table("wwi_fact_sale")
      .select(col("graft_month")).distinct().count()
    val added = WwiStar.growSale(spark, copies = 3)
    assert(spark.table("wwi_fact_sale").count() === before + added)
    assert(spark.table("wwi_fact_sale")
      .select(col("graft_month")).distinct().count() >= monthsBefore)

    // partition pruning: one-month filter must scan a strict subset of files
    val allFiles = scanFileCounts(spark.table("wwi_fact_sale")).sum
    val month = spark.table("wwi_fact_sale")
      .select(col("graft_month")).distinct().limit(1)
      .collect()(0).getString(0)
    val prunedFiles = scanFileCounts(
      spark.table("wwi_fact_sale").filter(col("graft_month") === month)).sum
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruning: $prunedFiles of $allFiles files")

    // collocated join: seed and fact are bucketed on [WWI Invoice ID] with
    // the same bucket count -> sort-merge join with NO hash-partition
    // exchange on either side (disable auto-broadcast so the bucketed SMJ
    // path, not a broadcast, is what's proven — J10)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wwi_fact_sale").as("f")
        .join(spark.table("wwi_seed_sale").as("s"), Seq("WWI Invoice ID"))
        .select(col("f.`City Key`"))
      joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), planStr.take(1500))
      assert(!planStr.contains("Exchange hashpartitioning"),
        s"collocated bucketed join must not shuffle:\n${planStr.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("rank-over-aggregate runs on the full star (whitepaper flagship)") {
    val dim = spark.table("wwi_dimension_city")
      .filter(col("`Valid To`") === lit(WwiStar.EndOfTime).cast("timestamp"))
    val ranked = spark.table("wwi_fact_sale")
      .join(dim, Seq("City Key"))
      .groupBy(col("`Sales Territory`"), col("City"))
      .agg(sum(col("`Total Excluding Tax`")).as("sales"))
      .withColumn("rnk", rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("`Sales Territory`")).orderBy(col("sales").desc)))
    assert(ranked.filter(col("rnk") === 1).count() > 0)
  }
  test("dynamic partition pruning fires on a dim-filtered month join") {
    if (!spark.catalog.tableExists("wwi_fact_sale")) WwiStar.build(spark, sfDir)
    import spark.implicits._
    // a month dimension with an attribute only the dim knows — the filter
    // cannot be pushed statically into the fact scan, so pruning must be
    // DYNAMIC (planned from the dim's broadcast at runtime)
    val months = spark.table("wwi_fact_sale")
      .select(col("graft_month")).distinct()
      .orderBy(col("graft_month"))
      .collect().map(_.getString(0))
    val monthDim = months.zipWithIndex
      .map { case (m, i) => (m, if (i % 4 == 0) "peak" else "normal") }
      .toSeq.toDF("month", "season")
    monthDim.write.mode("overwrite").saveAsTable("wwi_month_dim")
    val q = spark.table("wwi_fact_sale")
      .join(spark.table("wwi_month_dim"),
        col("graft_month") === col("month"))
      .filter(col("season") === "peak")
      .agg(sum(col("Quantity")).as("qty"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected DPP on the fact's partition column: $plan")
    // and the answer matches the statically-pruned equivalent
    val peakMonths = months.zipWithIndex.collect {
      case (m, i) if i % 4 == 0 => m
    }
    val expect = spark.table("wwi_fact_sale")
      .filter(col("graft_month").isin(peakMonths: _*))
      .agg(sum(col("Quantity")).as("qty")).collect()(0).get(0)
    assert(q.collect()(0).get(0) === expect)
  }
}
