package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level prefix devices against the naive global-window truth
  * they replace — runningSum/rowNumber/ntileExpr back every formerly
  * single-task running statistic (q112/q140/q157/q176/q185/q208/q246/
  * q249/q464–466/q525/q575 in r7; q114/q164/q242/q254/q297 and the
  * day/price/grid-spine q123/q171/q376/q518/q519/q527/q530/q534/q535/
  * q541/q550/q578 in r8 — runningMax and lagOver/leadOver landed for
  * those), so equivalence is pinned directly, on adversarial shapes:
  * duplicate values (tie-break crossing), negative weights (signed
  * walks), negative values (shifted bucketing), a constant column
  * (every row in ONE bucket — the degenerate range), and sparse
  * buckets (boundary stitching for lag/lead).
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (value, tie, weight)
  private def rows(n: Int, valueMod: Long): Seq[(Long, Long, Long)] =
    (1 to n).map { i =>
      val h = ((i * 2654435761L) ^ (i << 7)).abs
      (h % valueMod - valueMod / 3, i.toLong, (h / 7 % 19) - 9)
    }

  test("runningSum matches the global window on ties, signs, both orders") {
    for (desc <- Seq(false, true); inc <- Seq(false, true)) {
      val df = rows(500, 37).toDF("v", "t", "w").repartition(4)
      val got = Prefix.runningSum(df, "v", Seq("t"), "w", "run",
        desc = desc, includeCurrent = inc)
      val ord = if (desc) Seq(col("v").desc, col("t")) else Seq(col("v"), col("t"))
      val frame = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, if (inc) 0 else -1)
      val want = df.withColumn("run",
        coalesce(sum(col("w")).over(frame), lit(0L)))
      assert(got.select(col("v"), col("t"), col("w"), col("run"))
        .exceptAll(want).isEmpty && want.exceptAll(
        got.select(col("v"), col("t"), col("w"), col("run"))).isEmpty,
        s"desc=$desc includeCurrent=$inc")
    }
  }

  test("runningSum survives a constant value column (one bucket)") {
    val df = (1 to 100).map(i => (7L, i.toLong, i.toLong)).toDF("v", "t", "w")
    val got = Prefix.runningSum(df, "v", Seq("t"), "w", "run",
      includeCurrent = true)
    val want = df.withColumn("run", sum(col("w")).over(
      Window.orderBy(col("v"), col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("runningSumBy matches the partitioned window per group") {
    for (desc <- Seq(false, true); inc <- Seq(false, true)) {
      val df = rows(400, 29).toDF("v", "t", "w")
        .withColumn("g", col("t") % 5).repartition(4)
      val got = Prefix.runningSumBy(df, Seq("g"), "v", Seq("t"), "w", "run",
        desc = desc, includeCurrent = inc)
      val ord = if (desc) Seq(col("v").desc, col("t")) else Seq(col("v"), col("t"))
      val frame = Window.partitionBy(col("g")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, if (inc) 0 else -1)
      val want = df.withColumn("run",
        coalesce(sum(col("w")).over(frame), lit(0L)))
      val sel = Seq(col("g"), col("v"), col("t"), col("w"), col("run"))
      assert(got.select(sel: _*).exceptAll(want.select(sel: _*)).isEmpty &&
        want.select(sel: _*).exceptAll(got.select(sel: _*)).isEmpty,
        s"desc=$desc includeCurrent=$inc")
    }
  }

  test("runningMax matches the global window incl. the empty-prefix NULL") {
    for (desc <- Seq(false, true); inc <- Seq(false, true)) {
      val df = rows(500, 37).toDF("v", "t", "w").repartition(4)
      val got = Prefix.runningMax(df, "v", Seq("t"), "w", "run",
        desc = desc, includeCurrent = inc)
      val ord = if (desc) Seq(col("v").desc, col("t")) else Seq(col("v"), col("t"))
      val frame = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, if (inc) 0 else -1)
      val want = df.withColumn("run", max(col("w")).over(frame))
      assert(got.select(col("v"), col("t"), col("w"), col("run"))
        .exceptAll(want).isEmpty && want.exceptAll(
        got.select(col("v"), col("t"), col("w"), col("run"))).isEmpty,
        s"desc=$desc includeCurrent=$inc")
    }
  }

  test("lagOver/leadOver match lag/lead across bucket boundaries") {
    // valueMod 3000 on 500 rows spreads values across many near-empty
    // buckets, so bucket-boundary stitching (nearest earlier/later
    // NON-EMPTY bucket) is exercised, not just the within-bucket path
    for (mod <- Seq(7L, 3000L)) {
      val df = rows(500, mod).toDF("v", "t", "w").repartition(4)
      val gotLag = Prefix.lagOver(df, "v", Seq("t"), "w", "p")
      val gotLead = Prefix.leadOver(df, "v", Seq("t"), "w", "nx")
      val w = Window.orderBy(col("v"), col("t"))
      val wantLag = df.withColumn("p", lag(col("w"), 1).over(w))
      val wantLead = df.withColumn("nx", lead(col("w"), 1).over(w))
      assert(gotLag.select(col("v"), col("t"), col("w"), col("p"))
        .exceptAll(wantLag).isEmpty && wantLag.exceptAll(
        gotLag.select(col("v"), col("t"), col("w"), col("p"))).isEmpty,
        s"lag mod=$mod")
      assert(gotLead.select(col("v"), col("t"), col("w"), col("nx"))
        .exceptAll(wantLead).isEmpty && wantLead.exceptAll(
        gotLead.select(col("v"), col("t"), col("w"), col("nx"))).isEmpty,
        s"lead mod=$mod")
    }
  }

  test("lagOver on a single row returns NULL (no predecessor)") {
    val df = Seq((5L, 1L, 42L)).toDF("v", "t", "w")
    val got = Prefix.lagOver(df, "v", Seq("t"), "w", "p").select(col("p"))
    assert(got.collect().map(_.isNullAt(0)).toSeq === Seq(true))
  }

  test("rowNumber and ntileExpr reproduce row_number and ntile exactly") {
    for (k <- Seq(3, 10, 16); n <- Seq(97, 160)) {
      val df = rows(n, 23).toDF("v", "t", "w").repartition(4)
      val rn = Prefix.rowNumber(df, "v", Seq("t"), "rn")
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .withColumn("tile", Prefix.ntileExpr("rn", "n", k))
        .select(col("v"), col("t"), col("rn"), col("tile"))
      val w = Window.orderBy(col("v"), col("t"))
      val want = df.select(col("v"), col("t"),
        row_number().over(w).cast("long").as("rn"),
        ntile(k).over(w).cast("long").as("tile"))
      assert(rn.exceptAll(want).isEmpty && want.exceptAll(rn).isEmpty,
        s"k=$k n=$n")
    }
  }
}
