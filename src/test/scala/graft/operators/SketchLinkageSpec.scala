package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q141 rolling sketch NDV, q142 sorted-neighborhood linkage, q143 BFS
  * reachability, q144 decayed value — the structural claims: sketch merge ≡
  * direct construction, SNM soundness vs brute force, BFS hops = true
  * shortest distances, dyadic decay exactness.
  */
class SketchLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("q141 merged rolling sketch equals the directly-built window sketch") {
    val roll = CoreQueries.q141RollingSketchNdv(spark, sfDir)
      .as[(Long, Double)].collect().toMap
    // rebuild three windows from scratch: same register pipeline but
    // filtered to the window's days BEFORE any merge — associativity of
    // register max means the estimates must be bit-identical
    val li = Tables.lineitem(spark, sfDir)
      .select(expr("unix_timestamp(l_shipdate) DIV 86400").as("day"),
        col("l_partkey"))
    val days = roll.keys.toSeq.sorted
    for (w <- Seq(days.head, days(days.size / 2), days.last)) {
      val direct = CoreQueries.directWindowEstimate(
        li.filter(col("day").between(w - CoreQueries.RollWindowDays + 1, w)))
      assert(direct === roll(w), s"window $w: merge path diverged")
    }
  }

  test("q142 reported pairs are sound and deterministic") {
    val got = FunctionQueries.q142SortedNeighborhood(spark, sfDir)
      .as[(Long, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, d, np) =>
      assert(a < b); assert(d <= 1); assert(np >= 1 && np <= 2)
    }
    // soundness: every reported pair is genuinely edit-distance ≤ 1, with
    // the reported distance (brute-force recheck on the reported pairs)
    val names = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      .collect().toMap
    def lev(x: String, y: String): Int = {
      val dp = Array.tabulate(x.length + 1)(i => i)
      for (j <- 1 to y.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to x.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(x.length)
    }
    got.foreach { case (a, b, d, _) =>
      assert(lev(names(a), names(b)) === d, s"pair ($a,$b) distance wrong")
    }
    val again = FunctionQueries.q142SortedNeighborhood(spark, sfDir)
      .as[(Long, Long, Int, Long)].collect()
    assert(got.sortBy(p => (p._1, p._2)) === again.sortBy(p => (p._1, p._2)))
  }

  test("q143 hop counts are the true shortest distances from the seed set") {
    val got = GraphQueries.q143BfsReach(spark, sfDir)
      .as[(Long, Int)].collect().toMap
    // serial BFS over the collected edge list
    val edges = GraphQueries.copurchaseEdges(spark, sfDir)
      .select(col("part_a"), col("part_b")).as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val seeds = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey")).as[Long].collect().toSet
    val dist = scala.collection.mutable.Map[Long, Int]()
    seeds.foreach(s => dist(s) = 0)
    var frontier = seeds
    for (h <- 1 to GraphQueries.BfsMaxHops) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    assert(got === dist.toMap)
  }

  test("q145 bloom reduction shrinks the probe side and loses no matches") {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val bloom = graft.plans.BloomReduce.bloomOf(
      o, col("o_orderkey"), CoreQueries.BloomExpectedOrders)
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val surviving = li.filter(
      graft.plans.BloomReduce.mightContain(bloom, col("l_orderkey"))).count()
    val trueMatches = li.join(o, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(surviving >= trueMatches, "bloom dropped a real match")
    assert(surviving < (total * 2) / 5,
      s"bloom reduced $total to only $surviving — no real scan-side cut")
    // and the reduced join's result is identical to the plain join
    val reduced = CoreQueries.q145BloomJoin(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    val plain = li.join(
        Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.TSql.cents(col("l_extendedprice"))).as("r"))
      .as[(String, Long, Long)].collect().toSet
    assert(reduced === plain)
  }

  test("q146 snapshot diff classifications are internally consistent") {
    val rows = CoreQueries.q146SnapshotDiff(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._3).sum === Tables.lineitem(spark, sfDir).count())
    rows.foreach { case (_, n1, n2, r1, r2, d, st) =>
      assert(n1 <= n2); assert(d === r2 - r1); assert(d >= 0)
      val expected = if (n1 == 0) "added"
        else if (n2 > n1) "changed" else "unchanged"
      assert(st === expected)
      if (st == "unchanged") assert(r1 === r2)
    }
    assert(rows.exists(_._7 == "changed"))
  }

  test("q147 TWAP matches a serial step-function integral") {
    val got = EventQueries.q147Twap(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), graft.functions.TSql.cents(col("value")).as("v"))
      .as[(Long, Long, Long, Long)].collect()
    val serial = raw.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val segs = sorted.zip(sorted.tail)
        .map { case (a, b) => (a._4, b._2 - a._2) }
      val dur = segs.map(_._2).sum
      if (dur > 0)
        Some(u -> ((segs.map { case (v, d) => v * d }.sum, dur)))
      else None
    }
    assert(got.keySet === serial.keySet)
    serial.foreach { case (u, (num, dur)) =>
      val (gn, gd, gt) = got(u)
      assert(gn === num); assert(gd === dur)
      assert(gt === num.toDouble / dur.toDouble)
    }
  }

  test("q148 median/MAD/outlier counts match a serial recompute") {
    val got = EventQueries.q148MadOutliers(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.functions.TSql.cents(col("value")))
      .as[(String, Long)].collect()
    def pdisc(xs: Seq[Long]): Long = {
      // percentile_disc(0.5): smallest member with cume_dist ≥ 0.5
      val s = xs.sorted
      s((math.ceil(s.size * 0.5) - 1).toInt)
    }
    raw.groupBy(_._1).foreach { case (t, vs) =>
      val xs = vs.map(_._2).toSeq
      val med = pdisc(xs)
      val mad = pdisc(xs.map(x => math.abs(x - med)))
      val out = xs.count(x => math.abs(x - med) * 10000L > mad * 44478L)
      val (gm, gmad, gn, gout) = got(t)
      assert(gm === med); assert(gmad === mad)
      assert(gn === xs.size.toLong); assert(gout === out.toLong)
    }
  }

  test("q149 count-min overestimate guarantee holds on every probe") {
    val rows = CoreQueries.q149CountMin(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, est, exact, over) =>
      assert(est >= exact, "CM underestimated — impossible by construction")
      assert(over === est - exact)
    }
  }

  test("q150 merged rollup equals a direct rollup at ANY split point") {
    import graft.functions.TSql.cents
    def direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("sq"))
      .as[(String, String, Long, Long)].collect().toSet
    val merged = CoreQueries.q150IncrementalRollup(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        col("sum_qty_c"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("q144 dyadic decay is exact and bounded by the undecayed total") {
    val rows = EventQueries.q144DecayedValue(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, num, dc, total) =>
      // the double is EXACTLY numerator / 2^8 (dyadic, no rounding)
      assert(dc === num.toDouble / (1L << EventQueries.DecayCapWeeks))
      // weights are in (0, 256]: decayed ≤ total, and > total/256 floor
      assert(num <= total * (1L << EventQueries.DecayCapWeeks))
      assert(num >= total)
    }
  }
}
