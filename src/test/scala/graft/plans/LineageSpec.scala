package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Column lineage: computed columns resolve to their true source columns
  * through joins, aggregates, windows, unions, and generators.
  */
class LineageSpec extends SparkSpec {

  test("star-join aggregate lineage reaches the right base columns") {
    val q = graft.operators.CoreQueries.q10StarJoin(spark, sfDir)
    val lin = Lineage.columnLineage(q)
    // revenue is derived from lineitem price and discount only
    val rev = lin.keys.find(_.contains("revenue")).getOrElse(
      fail(s"no revenue column in ${lin.keys}"))
    assert(lin(rev).contains(("lineitem", "l_extendedprice")), lin(rev))
    assert(lin(rev).contains(("lineitem", "l_discount")), lin(rev))
    assert(!lin(rev).exists(_._1 == "nation"), lin(rev))
    // the nation name comes from nation.n_name alone
    val nname = lin.keys.find(_.toLowerCase.contains("n_name")).getOrElse(
      fail(s"no n_name in ${lin.keys}"))
    assert(lin(nname) === Set(("nation", "n_name")))
  }

  test("expression, window, union, and explode derivations resolve") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    // CASE + arithmetic over two tables
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(when(col("l_discount") > 0.05,
        col("l_extendedprice") * col("l_tax")).otherwise(col("o_totalprice"))
        .as("mixed"))
    val mixed = Lineage.columnLineage(j)("mixed")
    assert(mixed === Set(("lineitem", "l_discount"),
      ("lineitem", "l_extendedprice"), ("lineitem", "l_tax"),
      ("orders", "o_totalprice")))
    // window function lineage includes partition/order references
    val w = li.select(col("l_orderkey"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))).as("rk"))
    val rk = Lineage.columnLineage(w)("rk")
    assert(rk.contains(("lineitem", "l_suppkey")) &&
      rk.contains(("lineitem", "l_shipdate")), rk)
    // union merges per-position contributions
    val u = li.select(col("l_orderkey").as("k"))
      .unionByName(o.select(col("o_orderkey").as("k")))
    assert(Lineage.columnLineage(u)("k") ===
      Set(("lineitem", "l_orderkey"), ("orders", "o_orderkey")))
    // explode resolves through the generator to the source column
    val g = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    assert(Lineage.columnLineage(g)("w") === Set(("documents", "text")))
  }

  test("PII never reaches the export — the CI-gate usage") {
    val c = Tables.customer(spark, sfDir)
    val export = c.select(col("c_custkey"), col("c_mktsegment"))
    val lin = Lineage.columnLineage(export)
    assert(!lin.values.flatten.exists(_._2 == "c_name"),
      "export must not derive from the name column")
  }
}
