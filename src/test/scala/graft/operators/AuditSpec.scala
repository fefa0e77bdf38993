package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q137 rolling actives, q138 exact heavy hitters, q139 quality audit,
  * q140 stats histogram — semantics re-derived through independent Spark
  * formulations plus the structural claims (bounded fan-out, map-side
  * partial candidate generation, Misra-Gries superset guarantee under
  * adversarial partitioning).
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("q137 equals the naive spine + COUNT(DISTINCT) formulation") {
    val got = EventQueries.q137RollingActives(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // independent naive: calendar spine, range join, distinct count
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400").as("day"))
      .distinct()
    val (lo, hi) = act.agg(min("day"), max("day"))
      .as[(Long, Long)].collect()(0)
    val spine = spark.range(lo, hi + 1).toDF("w")
    val naive = spine.join(act,
        col("day").between(col("w") - (EventQueries.RollingDays - 1), col("w")))
      .groupBy("w").agg(countDistinct("user_id").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("q137 fan-out is bounded by RollingDays × deduplicated user-days") {
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400").as("day"))
      .distinct().count()
    // every output unit is one exploded contribution row
    val contributions = EventQueries.q137RollingActives(spark, sfDir)
      .agg(sum("active_7d")).as[Long].collect()(0)
    assert(contributions <= EventQueries.RollingDays * userDays)
  }

  test("q138 equals the naive full GROUP BY ... HAVING") {
    val got = EventQueries.q138HeavyHitters(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val e = Tables.events(spark, sfDir)
    val total = e.count()
    val naive = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") * EventQueries.HeavyFrac >= total)
      .as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("q138 candidate generation is a map-side partial aggregate") {
    val e = Tables.events(spark, sfDir)
    val plan = e.agg(graft.functions.Sampling
        .frequentCandidates(col("user_id"), EventQueries.HeavyK))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial_frequentitemsagg"),
      s"candidate pass lost its map-side partial:\n$plan")
  }

  test("Misra-Gries candidates are a superset of heavy items under " +
      "adversarial partitioning and k-overflow") {
    // 40 distinct items >> k=4; item 1 holds 30% > 1/(k+1)=20%, spread so
    // every partition also sees the long tail first
    val rows = (0 until 300).map(i => 1L) ++
      (0 until 700).map(i => (i % 39) + 2L)
    val df = rows.toDF("item").repartition(8)
    val cands = df.agg(graft.functions.Sampling
        .frequentCandidates(col("item"), 4).as("c"))
      .select(explode(col("c"))).as[Long].collect().toSet
    assert(cands.size <= 4)
    assert(cands.contains(1L), s"heavy item lost from candidates: $cands")
  }

  test("q139 report: zero-violation invariants and the seeded findings") {
    val rows = AuditQueries.q139QualityAudit(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
      .map { case (t, c, v, n) => (t, c) -> ((v, n)) }.toMap
    // clean-by-construction checks
    assert(rows(("customer", "custkey_unique"))._1 === 0L)
    assert(rows(("orders", "fk_custkey"))._1 === 0L)
    assert(rows(("lineitem", "fk_orderkey"))._1 === 0L)
    assert(rows(("documents", "nchars_consistent"))._1 === 0L)
    // the synthetic data genuinely violates these declared expectations
    assert(rows(("lineitem", "tax_le_discount"))._1 > 0L)
    assert(rows(("lineitem", "linenumber_range"))._1 > 0L)
    // totals are per-table row counts, consistent across that table's checks
    val liTotal = Tables.lineitem(spark, sfDir).count()
    rows.collect { case ((t, _), (_, n)) if t == "lineitem" => n }
      .foreach(n => assert(n === liTotal))
  }

  test("q140 histogram: equi-depth buckets tile the column") {
    val h = AuditQueries.q140Histogram(spark, sfDir)
      .orderBy("bucket").as[(Int, Long, Long, Long)].collect()
    assert(h.length === AuditQueries.HistBuckets)
    assert(h.map(_._2).sum === Tables.lineitem(spark, sfDir).count())
    // equi-depth: sizes differ by at most one
    assert(h.map(_._2).max - h.map(_._2).min <= 1)
    // the unique (c, orderkey, linenumber) total order assigns values in
    // sorted runs, so bucket bounds never interleave (ties may touch)
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3,
        s"bucket ${a._1} hi ${a._4} > bucket ${b._1} lo ${b._3}")
      assert(a._3 <= a._4)
    }
  }

  test("q218 FD audit: key FDs hold, denormalization FDs report violations") {
    val rows = AuditQueries.q218FdAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    // o_orderkey is the orders key: FD must hold with max distinct 1
    val key = rows(("orders", "o_orderkey", "o_custkey"))
    assert(key._4 && key._2 === 0L && key._3 === 1L)
    assert(rows(("documents", "doc_id", "lang"))._4)
    // a market segment spans many nations — the FD must NOT hold
    val seg = rows(("customer", "c_mktsegment", "c_nationkey"))
    assert(!seg._4 && seg._2 > 0L && seg._3 > 1L)
    // holds <=> zero violating groups, for every candidate
    rows.values.foreach { case (_, viol, _, holds) =>
      assert(holds === (viol === 0L))
    }
  }

  test("q219 IND scan: star FKs are contained, reverse direction is partial") {
    val rows = AuditQueries.q219IndScan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    // real star foreign keys: full containment
    Seq(("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("orders.o_custkey", "customer.c_custkey")).foreach { k =>
      val (n, contained, e6, isFk) = rows(k)
      assert(isFk && contained === n && e6 === 1000000L, s"$k not an FK")
    }
    // every candidate: containment is a fraction of the distinct count
    rows.values.foreach { case (n, contained, e6, _) =>
      assert(contained <= n && e6 <= 1000000L && e6 >= 0L)
    }
    // the cross-domain probe (user ids vs customer keys) must not be
    // reported as a clean FK at this scale: user_id range ≠ custkey range
    val probe = rows(("events.user_id", "customer.c_custkey"))
    val parts = rows(("part.p_partkey", "lineitem.l_partkey"))
    assert(probe._1 > 0 && parts._1 > 0)
  }
}
