package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TSql.cents
import org.apache.spark.sql.functions._

/** q151 SCD-2 rebuild, q152 largest-remainder allocation, q153 χ²
  * independence cells, q154 two-feature OLS — the structural claims:
  * rebuilt validity intervals partition each user's history, allocations
  * sum EXACTLY to the header total with error ≤ 1 cent per line, the
  * contingency marginals are consistent, and the closed-form coefficients
  * solve the normal equations.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("q151 rebuilt SCD-2 intervals partition each user's event history") {
    val runs = EventQueries.q151ScdRebuild(spark, sfDir)
      .select(col("user_id"), col("version"), col("state"),
        unix_millis(col("valid_from")).as("from_ms"),
        unix_millis(col("valid_to")).as("to_ms"), col("n_events"))
      .as[(Long, Long, String, Long, Option[Long], Long)].collect()
    assert(runs.nonEmpty)
    val events = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    runs.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // versions are 1..k with no gaps
      assert(sorted.map(_._2).toSeq === (1L to sorted.size).toSeq)
      // exactly one open interval, and it is the last version
      assert(sorted.count(_._5.isEmpty) === 1)
      assert(sorted.last._5.isEmpty)
      // end-exclusive bounds chain: each run closes where the next opens,
      // and adjacent runs really changed state (maximal runs)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5.contains(b._4), s"user $u: gap or overlap in history")
        assert(a._3 != b._3, s"user $u: adjacent runs share state")
      }
      // run sizes account for every event of the user
      assert(sorted.map(_._6).sum === events(u))
    }
  }

  test("q171 backlog equals a serial interval sweep and ends at zero") {
    val rows = CoreQueries.q171Backlog(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // running sum identity and the all-orders-eventually-ship invariant
    var acc = 0L
    for ((_, net, open) <- rows) { acc += net; assert(open === acc) }
    assert(rows.last._3 === 0L, "every order closes after its last shipment")
    // serial reference: sweep the per-order intervals
    val close = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(max(expr("unix_timestamp(l_shipdate) DIV 86400")).as("c"))
    val iv = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) DIV 86400").as("s"))
      .join(close, col("o_orderkey") === col("l_orderkey"))
      .select(col("s"), col("c")).collect()
      .map(r => (r.getLong(0), math.max(r.getLong(0), r.getLong(1))))
    for ((d, _, open) <- rows.take(50))
      assert(open === iv.count { case (s, c) => s <= d && d <= c }.toLong, d)
  }

  test("q172 HHI is bounded by [1/n, 1] and hits 1e6 for single-source parts") {
    val rows = CoreQueries.q172SupplierHhi(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, hhi) = (r.getAs[Long]("n_suppliers"), r.getAs[Long]("hhi_e6"))
      assert(hhi <= 1000000L, r)
      // HHI ≥ 1/n (equality at equal shares); allow the e6 truncation
      assert(hhi >= 1000000L / n - 1, r)
      if (n == 1) assert(hhi === 1000000L, r)
    }
  }

  test("q170 SLA percentiles are ordered and the rate matches the counts") {
    val rows = CoreQueries.q170SlaLatency(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("median_d") <= r.getAs[Long]("p90_d"), r)
      assert(r.getAs[Long]("p90_d") <= r.getAs[Long]("max_d"), r)
      val expected = BigInt(r.getAs[Long]("n_within_sla")) * 1000000 /
        BigInt(r.getAs[Long]("n_lines"))
      assert(r.getAs[Long]("sla_rate_e6") === expected.toLong, r)
    }
  }

  test("q175 bridge effects reconcile exactly to the revenue delta") {
    val rows = CoreQueries.q175PriceVolumeMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_c") ===
        r.getAs[Long]("price_eff_c") + r.getAs[Long]("volume_eff_c") +
          r.getAs[Long]("joint_c"), r)
      assert(r.getAs[Long]("delta_c") ===
        r.getAs[Long]("r2_c") - r.getAs[Long]("r1_c"), r)
    }
  }

  test("q176 gap report accounts for the whole key span") {
    val keys = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey")).distinct().collect().map(_.getLong(0))
    val gaps = CoreQueries.q176KeyGaps(spark, sfDir).collect()
    assert(gaps.nonEmpty, "the driver data has childless orders")
    val missing = gaps.map(_.getAs[Long]("n_missing")).sum
    assert(keys.length + missing === keys.max - keys.min + 1)
    gaps.foreach { g =>
      val (a, b) = (g.getAs[Long]("gap_start"), g.getAs[Long]("gap_end"))
      assert(a <= b)
      assert(g.getAs[Long]("n_missing") === b - a + 1)
      assert(!keys.exists(k => k >= a && k <= b), g)
    }
  }

  test("q178/q180 order-grain rollups tile the shipped-order population") {
    val shippedOrders = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey")).distinct().count()
    val spans = CoreQueries.q178ShipSpans(spark, sfDir).collect()
    assert(spans.map(_.getAs[Long]("n_orders")).sum === shippedOrders)
    spans.foreach { r =>
      assert(r.getAs[Long]("n_single") <= r.getAs[Long]("n_orders"), r)
      assert(r.getAs[Long]("p90_span_d") <= r.getAs[Long]("max_span_d"), r)
    }
    val otif = CoreQueries.q180Otif(spark, sfDir).collect()
    assert(otif.map(_.getAs[Long]("n_orders")).sum === shippedOrders)
    otif.foreach { r =>
      val rate = BigInt(r.getAs[Long]("n_otif")) * 1000000 /
        BigInt(r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("otif_rate_e6") === rate.toLong, r)
    }
  }

  test("q179 dispersion index matches a serial variance/mean recompute") {
    val rows = CoreQueries.q179DispersionIndex(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val counts = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("x"))
      .join(graft.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("x")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    for ((seg, xs0) <- counts.groupBy(_._1)) {
      val xs = xs0.map(_._2.toDouble)
      val n = xs.length.toDouble
      val d = (n * xs.map(x => x * x).sum - math.pow(xs.sum, 2)) /
        (n * xs.sum)
      val got = rows(seg).getAs[Long]("dispersion_e6")
      assert(math.abs(got - math.floor(d * 1e6)) <= 1, s"$seg: $got vs $d")
    }
  }

  test("q181 k-anonymity report matches a serial group-size recount") {
    val Array(r) = CoreQueries.q181KAnonymity(spark, sfDir).collect()
    val rows = graft.Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        expr("(CAST(ROUND(c_acctbal*100) AS BIGINT) + 100000) div 100000"),
        col("c_mktsegment")).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getString(2)))
    val groups = rows.groupBy(_._1)
    assert(r.getAs[Long]("n_groups") === groups.size.toLong)
    assert(r.getAs[Long]("n_rows") === rows.length.toLong)
    assert(r.getAs[Long]("k_min") === groups.values.map(_.length).min.toLong)
    assert(r.getAs[Long]("l_min") ===
      groups.values.map(_.map(_._2).distinct.length).min.toLong)
    assert(r.getAs[Long]("rows_below_k5") ===
      groups.values.filter(_.length < 5).map(_.length).sum.toLong)
    assert(r.getAs[Long]("groups_below_l2") ===
      groups.values.count(_.map(_._2).distinct.length < 2).toLong)
  }

  test("q152 allocations sum exactly to the header total per order") {
    val rows = CoreQueries.q152Allocation(spark, sfDir)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    val totals = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-02-01"))
      .select(col("o_orderkey"), cents(col("o_totalprice")))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (ok, ls) =>
      val t = totals(ok)
      // the defining invariant: cents are conserved exactly
      assert(ls.map(_._4).sum === t, s"order $ok: allocation lost cents")
      // each line is within 1 cent of its exact proportional share
      val w = ls.map(_._3).sum
      ls.foreach { case (_, ln, wc, ac) =>
        val exact = t.toDouble * wc.toDouble / w.toDouble
        assert(math.abs(ac - exact) <= 1.0,
          s"order $ok line $ln: |$ac - $exact| > 1 cent")
      }
    }
  }

  test("q153 contingency marginals are consistent and χ² matches a recount") {
    val cells = AuditQueries.q153ChiSquare(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long, Double, Double)].collect()
    assert(cells.nonEmpty)
    val grand = cells.map(_._3).sum
    cells.foreach { case (_, _, _, _, _, g, _, _) => assert(g === grand) }
    // marginals recompose from the cells themselves
    val byRow = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val byCol = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    cells.foreach { case (r, c, n, rt, ct, g, exp, chi) =>
      assert(rt === byRow(r)); assert(ct === byCol(c))
      val e = rt.toDouble * ct.toDouble / g.toDouble
      assert(math.abs(exp - e) < 1e-9 * e)
      val d = (n.toDouble * g.toDouble - rt.toDouble * ct.toDouble)
      val expect = d * d / (rt.toDouble * ct.toDouble * g.toDouble)
      assert(math.abs(chi - expect) < 1e-9 * (expect max 1.0))
      assert(chi >= 0.0)
    }
  }

  test("q155 prefix-min closed form equals the serial clamped recurrence") {
    val got = CoreQueries.q155ClampedBalance(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        unix_millis(col("l_shipdate").cast("timestamp")),
        col("l_orderkey"), col("l_linenumber").cast("long"),
        when(col("l_returnflag") === "R", cents(col("l_quantity")))
          .otherwise(-cents(col("l_quantity"))))
      .as[(Long, Long, Long, Long, Long)].collect()
    raw.groupBy(_._1).foreach { case (pk, ms) =>
      val deltas = ms.sortBy(m => (m._2, m._3, m._4)).map(_._5)
      // the serial ledger: x_t = max(0, x_{t-1} + delta_t)
      val xs = deltas.scanLeft(0L)((x, d) => math.max(0L, x + d)).tail
      val (nMoves, endBal, peakBal, rawNet) = got(pk)
      assert(nMoves === deltas.size.toLong)
      assert(endBal === xs.last, s"part $pk: closed form != recurrence")
      assert(peakBal === xs.max)
      assert(rawNet === deltas.sum)
    }
  }

  test("q156 island sweep equals a serial interval-union merge") {
    val got = EventQueries.q156IntervalUnion(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val w = EventQueries.CoverageWindowMs
    raw.groupBy(_._1).foreach { case (u, evs) =>
      val ivs = evs.sortBy(e => (e._2, e._3)).map(e => (e._2, e._2 + w))
      // serial merge of sorted intervals
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, (s1, e1)) if s1 <= e0 =>
          (s0, math.max(e0, e1)) :: rest
        case (acc, iv) => iv :: acc
      }.reverse
      val (nIslands, covered, nEvents) = got(u)
      assert(nIslands === merged.size.toLong, s"user $u: island count")
      assert(covered === merged.map { case (s0, e0) => e0 - s0 }.sum)
      assert(nEvents === evs.size.toLong)
    }
  }

  test("q157 KS distance equals a serial empirical-CDF sweep") {
    val Seq((atV, n1, n2, ksD)) = AuditQueries.q157KsTest(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val raw = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(cents(col("o_totalprice")), col("o_orderpriority"))
      .as[(Long, String)].collect()
    val a = raw.filter(_._2 == "1-URGENT").map(_._1).sorted
    val b = raw.filter(_._2 == "5-LOW").map(_._1).sorted
    assert(n1 === a.length.toLong); assert(n2 === b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val devs = values.map { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      (math.abs(c1 * n2 - c2 * n1), v)
    }
    val best = devs.maxBy { case (d, v) => (d, -v) }
    assert(atV === best._2, "argmax value differs from serial sweep")
    assert(ksD === best._1.toDouble / (n1 * n2).toDouble)
  }

  test("q158 CDC collapse equals a serial last-writer-wins replay") {
    val got = EventQueries.q158CdcApply(spark, sfDir)
      .select(col("user_id"), col("last_op"), unix_millis(col("last_ts")),
        col("last_value_c"), col("n_changes"))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")), col("event_id"),
        col("event_type"), cents(col("value")))
      .as[(Long, Long, Long, String, Long)].collect()
    def opOf(t: String) =
      if (t == "signup") "I" else if (t == "error") "D" else "U"
    raw.groupBy(_._1).foreach { case (u, evs) =>
      val last = evs.maxBy(e => (e._2, e._3))
      if (opOf(last._4) == "D")
        assert(!got.contains(u), s"user $u: deleted key survived")
      else {
        val (op, ts, v, n) = got(u)
        assert(op === opOf(last._4)); assert(ts === last._2)
        assert(v === last._5); assert(n === evs.size.toLong)
      }
    }
  }

  test("q159 weighted median halves the total weight on each side") {
    val got = CoreQueries.q159WeightedMedian(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), cents(col("l_extendedprice")),
        cents(col("l_quantity")))
      .as[(String, Long, Long)].collect()
    got.foreach { case (rf, med, wTotal) =>
      val g = raw.filter(_._1 == rf)
      assert(wTotal === g.map(_._3).sum)
      // the defining property of the weighted median, exactly as computed
      val below = g.filter(_._2 < med).map(_._3).sum
      val upTo = g.filter(_._2 <= med).map(_._3).sum
      assert(2 * below < wTotal, s"$rf: too much weight strictly below")
      assert(2 * upTo >= wTotal, s"$rf: median does not reach half weight")
    }
  }

  test("q160 Gini equals a serial rank-formula recompute and is in [0,1)") {
    val got = CoreQueries.q160Gini(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val rev = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("r"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (nk, n, s0, gini) =>
      val xs = rev.filter(_._1 == nk).sortBy(r => (r._3, r._2)).map(_._3)
      assert(n === xs.size.toLong)
      assert(s0 === xs.sum)
      val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      val expect = (2.0 * s1 - (n + 1).toDouble * s0) / (n.toDouble * s0)
      assert(math.abs(gini - expect) < 1e-9)
      assert(gini >= 0.0 && gini < 1.0)
    }
  }

  test("q155/q156/q158 plans shuffle exactly once on their partition key") {
    // the 100×-scale claim in each scaladoc, held by the optimizer: the
    // stacked windows + final rollup all reuse ONE hash partitioning
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(CoreQueries.q155ClampedBalance(spark, sfDir)) === 1)
    assert(exchanges(EventQueries.q156IntervalUnion(spark, sfDir)) === 1)
    assert(exchanges(EventQueries.q158CdcApply(spark, sfDir)) === 1)
  }

  test("q161 TV drift equals a serial exact-integer recompute") {
    val rows = EventQueries.q161DriftTv(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"),
        ((expr("unix_timestamp(ts) DIV 86400") + 4) % 7 < 5).as("wd"))
      .as[(String, Boolean)].collect()
    val nWd = raw.count(_._2).toLong
    val nWe = raw.size - nWd
    var devSum = BigInt(0)
    rows.foreach { case (et, cw, ce, contrib, _) =>
      assert(cw === raw.count(r => r._1 == et && r._2).toLong)
      assert(ce === raw.count(r => r._1 == et && !r._2).toLong)
      val dev = (BigInt(cw) * nWe - BigInt(ce) * nWd).abs
      assert(contrib === dev.toDouble / (BigInt(nWd) * nWe).toDouble)
      devSum += dev
    }
    val tv = devSum.toDouble / (BigInt(2) * nWd * nWe).toDouble
    rows.foreach { case (_, _, _, _, t) => assert(t === tv) }
    assert(tv >= 0.0 && tv <= 1.0)
  }

  test("q162 streaks equal a serial consecutive-day replay") {
    val got = EventQueries.q162Streaks(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400"))
      .as[(Long, Long)].collect()
    raw.groupBy(_._1).foreach { case (u, evs) =>
      val days = evs.map(_._2).distinct.sorted
      // serial streak scan
      val streaks = days.foldLeft(List.empty[Long]) {
        case (h :: t, d) if days.contains(d - 1) => (h + 1) :: t
        case (acc, _) => 1L :: acc
      }
      val (nDays, nStreaks, longest) = got(u)
      assert(nDays === days.size.toLong)
      assert(nStreaks === streaks.size.toLong)
      assert(longest === streaks.max)
    }
  }

  test("q163 shares recompose: nations to their region, regions to one") {
    val rows = CoreQueries.q163PercentOfParent(spark, sfDir)
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ns) =>
      assert(math.abs(ns.map(_._4).sum - 1.0) < 1e-9,
        "nation shares must sum to 1 within each region")
    }
    // each region's share appears identically on its nations; they sum to 1
    val regionShares = rows.groupBy(_._1).map { case (r, ns) =>
      assert(ns.map(_._5).distinct.size === 1); ns.head._5
    }
    assert(math.abs(regionShares.sum - 1.0) < 1e-9)
  }

  test("q154 closed-form coefficients solve the 2x2 normal equations") {
    val got = CoreQueries.q154Ols2(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), cents(col("l_quantity")),
        cents(col("l_discount")), cents(col("l_extendedprice")))
      .as[(String, Long, Long, Long)].collect()
    got.foreach { case (rf, n, b1, b2, b0) =>
      val g = raw.filter(_._1 == rf)
      assert(n === g.size.toLong)
      // the normal equations: X'X β = X'y must hold at the returned β
      val (sx1, sx2, sy) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      val sx1x1 = g.map(r => r._2 * r._2).sum
      val sx2x2 = g.map(r => r._3 * r._3).sum
      val sx1x2 = g.map(r => r._2 * r._3).sum
      val sx1y = g.map(r => r._2 * r._4).sum
      val sx2y = g.map(r => r._3 * r._4).sum
      def near(a: Double, b: Double): Boolean =
        math.abs(a - b) <= 1e-6 * (math.abs(a) max math.abs(b) max 1.0)
      val eq1 = b0 * n + b1 * sx1 + b2 * sx2
      val eq2 = b0 * sx1 + b1 * sx1x1 + b2 * sx1x2
      val eq3 = b0 * sx2 + b1 * sx1x2 + b2 * sx2x2
      assert(near(eq1, sy.toDouble), s"$rf: sum of fitted y != sum y")
      assert(near(eq2, sx1y.toDouble), s"$rf: x1 normal equation violated")
      assert(near(eq3, sx2y.toDouble), s"$rf: x2 normal equation violated")
    }
  }
}
