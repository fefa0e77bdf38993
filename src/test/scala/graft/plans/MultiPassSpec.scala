package graft.plans

import graft.{SparkSpec, Tables}
import graft.plans.MultiPass.Pass
import org.apache.spark.sql.functions._

/** The four documented SQL-Global-Optimization rewrites (whitepaper.md:
  * 419-433) shrink a multi-pass report and preserve its results exactly.
  */
class MultiPassSpec extends SparkSpec {

  private def plan = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("mp_orders")
    Seq(
      // identical passes -> reused
      Pass("p_cust_a", "mp_orders", groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "n" -> "COUNT(1)")),
      Pass("p_cust_b", "mp_orders", groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "n" -> "COUNT(1)")),
      // same shape, different SELECT lists -> combined
      Pass("p_sel_lo", "mp_orders", where = Some("o_totalprice < 100000"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "lo_n" -> "COUNT(1)")),
      Pass("p_sel_hi", "mp_orders", where = Some("o_totalprice < 100000"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "lo_sum" -> "SUM(o_totalprice)")),
      // same SELECT/FROM/GROUP BY, different WHERE -> CASE merge
      Pass("p_w_f", "mp_orders", where = Some("o_orderstatus = 'F'"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "t" -> "SUM(o_totalprice)")),
      Pass("p_w_o", "mp_orders", where = Some("o_orderstatus = 'O'"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "t" -> "SUM(o_totalprice)")),
      // never referenced -> eliminated
      Pass("p_unused", "mp_orders", select = Seq("x" -> "MAX(o_orderkey)")),
      // final report joins the intermediate passes
      Pass("p_final", "p_cust_a",
        joins = Seq(
          "JOIN p_cust_b ON p_cust_a.ck = p_cust_b.ck",
          "LEFT JOIN p_sel_lo ON p_cust_a.ck = p_sel_lo.ck",
          "LEFT JOIN p_sel_hi ON p_cust_a.ck = p_sel_hi.ck",
          "LEFT JOIN p_w_f ON p_cust_a.ck = p_w_f.ck",
          "LEFT JOIN p_w_o ON p_cust_a.ck = p_w_o.ck"),
        select = Seq(
          "ck" -> "p_cust_a.ck", "n" -> "p_cust_a.n",
          "lo_n" -> "p_sel_lo.lo_n", "lo_sum" -> "p_sel_hi.lo_sum",
          "f_total" -> "p_w_f.t", "o_total" -> "p_w_o.t")))
  }

  test("rewrites shrink the pass count and preserve results bit-for-bit") {
    val passes = plan
    val opt = MultiPass.optimize(passes, "p_final")
    // 8 passes -> reuse kills 1, select-merge folds 2 into 1, where-merge
    // folds 2 into 1, unused eliminated: 4 executable passes remain
    assert(opt.passCount === 4, opt.passes.map(_.name))
    assert(opt.passes.exists(_.name === "p_w_f_p_w_o"))
    assert(opt.passes.exists(_.name === "p_sel_lo_p_sel_hi"))
    assert(opt.views.map(_._1).toSet ===
      Set("p_cust_b", "p_sel_lo", "p_sel_hi", "p_w_f", "p_w_o"))

    val optimized = MultiPass.execute(spark, opt, "p_final")
      .orderBy(col("ck")).collect()
    val naive = MultiPass.executeNaive(spark, passes, "p_final")
      .orderBy(col("ck")).collect()
    assert(optimized.length === naive.length)
    optimized.zip(naive).foreach { case (a, b) => assert(a === b) }

    // the WHERE->CASE merge also preserves each pass's group SET (a group
    // with no matching rows must stay absent, not appear with NULLs)
    val fOnly = MultiPass.execute(spark, opt, "p_w_f")
      .orderBy(col("ck")).collect()
    spark.sql(
      """SELECT o_custkey AS ck, SUM(o_totalprice) AS t FROM mp_orders
        |WHERE o_orderstatus = 'F' GROUP BY o_custkey ORDER BY ck""".stripMargin)
      .collect().zip(fOnly).foreach { case (a, b) => assert(a === b) }
  }

  test("non-case-able aggregates and subquery references survive (ADVICE r2)") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("mp_orders")
    val passes = Seq(
      // COUNT(*), COUNT(DISTINCT x), and SUM(a)+SUM(b): same shape,
      // different WHEREs, but CASE-wrapping their args would emit invalid
      // SQL — the merge must skip them and keep both passes runnable
      Pass("p_star_f", "mp_orders", where = Some("o_orderstatus = 'F'"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "n" -> "COUNT(*)",
          "nd" -> "COUNT(DISTINCT(o_orderpriority))",
          "mix" -> "SUM(o_totalprice) + SUM(o_orderkey)")),
      Pass("p_star_o", "mp_orders", where = Some("o_orderstatus = 'O'"),
        groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "n" -> "COUNT(*)",
          "nd" -> "COUNT(DISTINCT(o_orderpriority))",
          "mix" -> "SUM(o_totalprice) + SUM(o_orderkey)")),
      // referenced ONLY from the final pass's WHERE subquery — must stay live
      Pass("p_where_ref", "mp_orders", groupBy = Seq("o_custkey"),
        select = Seq("ck" -> "o_custkey", "total" -> "SUM(o_totalprice)")),
      Pass("p_final2", "p_star_f",
        joins = Seq("JOIN p_star_o ON p_star_f.ck = p_star_o.ck"),
        where = Some(
          "p_star_f.ck IN (SELECT ck FROM p_where_ref WHERE total > 0)"),
        select = Seq("ck" -> "p_star_f.ck", "f_n" -> "p_star_f.n",
          "o_n" -> "p_star_o.n")))
    val opt = MultiPass.optimize(passes, "p_final2")
    // no WHERE->CASE merge happened (both unmergeable passes survive) and
    // the subquery-only reference was not eliminated as unused
    assert(opt.passes.map(_.name).toSet ===
      Set("p_star_f", "p_star_o", "p_where_ref", "p_final2"))
    val got = MultiPass.execute(spark, opt, "p_final2").count()
    val naive = MultiPass.executeNaive(spark, passes, "p_final2").count()
    assert(got === naive && got > 0)
  }

  test("temp-table fallback kicks in past the documented pass bound") {
    val passes = plan
    val opt = MultiPass.optimize(passes, "p_final")
    // explicit temp-table mode must give the same rows
    val viaTemp = MultiPass.execute(spark, opt, "p_final",
      tempTableMode = Some(true)).count()
    val viaDerived = MultiPass.execute(spark, opt, "p_final",
      tempTableMode = Some(false)).count()
    assert(viaTemp === viaDerived)
  }
}
