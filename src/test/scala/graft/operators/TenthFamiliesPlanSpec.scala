package graft.operators

import graft.SparkSpec

/** Plan pins + semantic invariants for the round-5 families
  * (q484–q491) — the standing 100 TB posture assertions: partial
  * aggregation on every fact rollup, broadcast-only metadata joins,
  * no cartesians on fact streams, bounded state; plus output-level
  * certificates for the estimators whose guarantee is checkable
  * in-output (AMS vs exact F₂, largest-remainder budgets, win-ratio
  * pair tiling).
  */
class TenthFamiliesPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir).collect()

  test("q484: AMS sums fold map-side; sketch state is 15 longs") {
    val p = plan("q484_ams_f2")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"the 15 tug-of-war sums must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val r = rows("q484_ams_f2")
    assert(r.length == 1)
    // the estimator is pinned against the exact F2 it estimates
    assert(r.head.getAs[Long]("exact_f2") > 0L)
    assert(r.head.getAs[Long]("est_f2") >= 0L)
  }

  test("q485: both allocations exhaust the budget exactly") {
    val r = rows("q485_neyman_allocation")
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("alloc_neyman")).sum ==
      AuditQueries.SampleBudget)
    assert(r.map(_.getAs[Long]("alloc_prop")).sum ==
      AuditQueries.SampleBudget)
    // every allocation is a nonnegative integer share
    assert(r.forall(_.getAs[Long]("alloc_neyman") >= 0L))
  }

  test("q486: no cartesian on facts; BD expected counts are admissible") {
    // the orders⋈broadcast-dim join lives behind the cell-rollup
    // checkpoint (the final plan reads the materialized 5-row rollup),
    // so the join-shape assertion is on the scalar stitch only
    val p = plan("q486_breslow_day")
    assert(!p.contains("CartesianProduct"), p)
    val r = rows("q486_breslow_day")
    assert(r.length == 5)
    // expected counts sit strictly inside the admissible cell range
    r.foreach { row =>
      val x = row.getAs[Double]("expected_a_d")
      val a = row.getAs[Long]("a"); val b = row.getAs[Long]("b")
      val c = row.getAs[Long]("c")
      assert(x > 0.0 && x < math.min(a + b, a + c), row.toString)
      assert(row.getAs[Long]("bd_term_e6") >= 0L)
    }
  }

  test("q487: IV total is the exact sum of its bin terms") {
    val r = rows("q487_woe_iv")
    assert(r.length == 5)
    val total = r.head.getAs[Long]("iv_total_e6")
    assert(r.map(_.getAs[Long]("iv_term_e6")).sum == total)
    // IV terms are nonnegative by construction ((p-q) and WoE share sign)
    assert(r.forall(_.getAs[Long]("iv_term_e6") >= 0L))
  }

  test("q488: dispersion index and its two standardizations agree in sign") {
    val r = rows("q488_overdispersion")
    assert(r.length == 1)
    val d = r.head.getAs[Long]("disp_index_e6")
    val n = r.head.getAs[Long]("n_customers")
    val z = r.head.getAs[Double]("z_fisher_d")
    // z > 0 iff D exceeds its Poisson expectation n-1
    assert((z > 0.0) == (d > (n - 1) * 1000000L))
  }

  test("q489: required n shrinks monotonically as the lift grows") {
    val r = rows("q489_sample_size")
    assert(r.length == 4)
    val ns = r.sortBy(_.getAs[Long]("lift_pct")).map(_.getAs[Long]("n_per_arm"))
    assert(ns.sliding(2).forall(p => p(0) >= p(1)), ns.mkString(","))
    assert(r.forall(row => row.getAs[Long]("n_total") ==
      2 * row.getAs[Long]("n_per_arm")))
  }

  test("q490: group medians ride the two-level device, not a group sort-agg") {
    val p = plan("q490_brown_forsythe")
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"the (priority, value) rollup must partial-aggregate:\n$p")
    val r = rows("q490_brown_forsythe")
    assert(r.length == 5)
    assert(r.forall(_.getAs[Long]("zbar_e6") >= 0L))
  }

  test("q492: gravity elasticity is finite and R² is a proper fraction") {
    val p = plan("q492_gravity_model")
    assert(!p.contains("CartesianProduct"), p)
    val r = rows("q492_gravity_model")
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_lanes") > 0L)
    val r2 = r.head.getAs[Double]("r2_d")
    assert(r2 >= 0.0 && r2 <= 1.0, r2.toString)
  }

  test("q493: the Kemeny winner is a true permutation of the top brands") {
    val r = rows("q493_kemeny_ranking")
    assert(r.length == AuditQueries.KemenyItems)
    assert(r.map(_.getAs[Int]("position")).sorted.toSeq ==
      (1 to AuditQueries.KemenyItems))
    assert(r.map(_.getAs[String]("brand")).distinct.length ==
      AuditQueries.KemenyItems)
    // one cost for the whole aggregate ranking
    assert(r.map(_.getAs[Long]("kemeny_cost")).distinct.length == 1)
  }

  test("q494: Johnson's schedule never loses to FCFS") {
    val r = rows("q494_johnson_rule")
    assert(r.length == AuditQueries.FlowShopJobs)
    val h = r.head
    assert(h.getAs[Long]("johnson_makespan") <=
      h.getAs[Long]("fcfs_makespan"))
    // makespan is at least the bottleneck machine's total load
    val m1tot = r.map(_.getAs[Long]("m1")).sum
    val m2tot = r.map(_.getAs[Long]("m2")).sum
    assert(h.getAs[Long]("johnson_makespan") >= math.max(m1tot, m2tot))
  }

  test("q495: the OC curve decreases as the defect rate grows") {
    val r = rows("q495_oc_curve").filter(_.getAs[String]("source") == "grid")
    val ps = r.sortBy(_.getAs[Long]("p_pm")).map(_.getAs[Double]("p_accept_d"))
    assert(ps.sliding(2).forall(w => w(0) >= w(1)), ps.mkString(","))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("q496: exactly one best decay; zero-decay slope is the plain OLS") {
    val r = rows("q496_adstock_selection")
    assert(r.length == AuditQueries.AdstockGridPm.length)
    assert(r.map(_.getAs[Long]("is_best")).sum == 1L)
    // best row carries the maximum R² on the ladder
    val best = r.find(_.getAs[Long]("is_best") == 1L).get
    assert(r.forall(row => Option(row.getAs[Any]("r2_e6")).fold(true)(_ =>
      row.getAs[Long]("r2_e6") <= best.getAs[Long]("r2_e6"))))
  }

  test("q497: UCB replay plays every day exactly once across arms") {
    val r = rows("q497_ucb_replay")
    assert(r.length == 5)
    assert(r.forall(_.getAs[Long]("plays") >= 1L)) // init plays all arms
    // total plays = number of order days (each day plays one arm)
    val totalPlays = r.map(_.getAs[Long]("plays")).sum
    val days = graft.Tables.orders(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("o_orderdate"))
      .distinct().count()
    assert(totalPlays == days, s"$totalPlays vs $days")
  }

  test("q498: every alpha rung allocates exactly 1000 permille; flatter alpha never concentrates more") {
    val r = rows("q498_mixture_weights")
    val byAlpha = r.groupBy(_.getAs[Long]("alpha_pm"))
    byAlpha.foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("alloc_pm")).sum == 1000L)
    }
    // effective source count grows (weakly) as alpha flattens toward 0
    val eff = byAlpha.map { case (a, g) =>
      a -> g.head.getAs[Long]("eff_sources") }.toSeq.sortBy(-_._1)
    assert(eff.map(_._2).sliding(2).forall(w => w(0) <= w(1)),
      eff.mkString(","))
    // alpha=1000 is proportional weighting: exp2(log2 t) recovers ~t
    val a1 = byAlpha(1000L)
    a1.foreach { row =>
      val t = row.getAs[Long]("tokens"); val w = row.getAs[Long]("weight_raw")
      assert(math.abs(w - t) <= t / 100 + 2, s"t=$t w=$w") // LUT grain
    }
  }

  test("q499: char entropy is bounded by log2 of the alphabet and length") {
    val r = rows("q499_char_entropy")
    assert(r.nonEmpty)
    r.foreach { row =>
      val h = row.getAs[Long]("entropy_e6")
      assert(h >= 0L && h <= 8000000L, row.toString) // <= 256-char alphabet
      assert((row.getAs[Long]("is_suspect") == 1L) ==
        (h < CurationQueries.CharEntropySuspectE6))
    }
    val p = plan("q499_char_entropy")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"the (doc, char) rollup must partial-aggregate map-side:\n$p")
  }

  test("q500: the MST has k-1 edges, spans all vertices, and sums its picks") {
    val r = rows("q500_mst_backbone")
    assert(r.length == GraphQueries.MstK - 1)
    // spanning: every vertex 1..k appears in some picked edge
    val touched = r.flatMap(row =>
      Seq(row.getAs[Long]("a"), row.getAs[Long]("b"))).toSet
    assert(touched == (1 to GraphQueries.MstK).map(_.toLong).toSet)
    assert(r.map(_.getAs[Long]("dist")).sum ==
      r.head.getAs[Long]("total_dist"))
  }

  test("q501: MMD² equals its own five-gap composition and is nonnegative") {
    val r = rows("q501_mmd_test")
    assert(r.length == 1)
    val h = r.head
    val expect = (2.0 * math.pow(h.getAs[Long]("gap_m1_e6").toDouble, 2)
      + 2.0 * math.pow(h.getAs[Long]("gap_m2_e6").toDouble, 2)
      + math.pow(h.getAs[Long]("gap_m11_e6").toDouble, 2)
      + math.pow(h.getAs[Long]("gap_m22_e6").toDouble, 2)
      + 2.0 * math.pow(h.getAs[Long]("gap_m12_e6").toDouble, 2)) / 1e12
    assert(math.abs(h.getAs[Double]("mmd2_d") - expect) < 1e-9)
    assert(h.getAs[Double]("mmd2_d") >= 0.0)
  }

  test("q502: energy distance is nonnegative and zero against itself") {
    val r = rows("q502_energy_distance")
    assert(r.length == 1)
    val h = r.head
    // D² ≥ 0 for any pair of distributions (within e6 floor slack)
    assert(h.getAs[Long]("energy_e6") >= -3L, h.toString)
    assert(h.getAs[Long]("exy_e6") >= 0L)
    val p = plan("q502_energy_distance")
    // the pair folds run on the 50-value spectra, never on row pairs
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q503: RE pooling sits between FE pooling and the raw mean; I2 in [0,1]") {
    val r = rows("q503_meta_analysis")
    assert(r.length == 5)
    val h = r.head
    val i2 = h.getAs[Long]("i2_e6")
    assert(i2 >= 0L && i2 <= 1000000L)
    assert(h.getAs[Long]("tau2_e12") >= 0L)
    // every region carries the same pooled summary columns
    assert(r.map(_.getAs[Long]("pooled_fe_e6")).distinct.length == 1)
    assert(r.map(_.getAs[Long]("pooled_re_e6")).distinct.length == 1)
  }

  test("q504: demand conservation — served + lost = total demand") {
    val r = rows("q504_inventory_policy")
    assert(r.length == 1)
    val h = r.head
    assert(h.getAs[Long]("served") + h.getAs[Long]("lost") ==
      h.getAs[Long]("total_demand"))
    val fr = h.getAs[Long]("fill_rate_e6")
    assert(fr >= 0L && fr <= 1000000L)
    assert(h.getAs[Long]("s_upto") == 2 * h.getAs[Long]("s_reorder"))
  }

  test("q505: alias table reconstructs every scaled weight exactly") {
    val r = rows("q505_alias_table")
    assert(r.length == AuditQueries.AliasK)
    // the construction invariant, exact integer equality per item
    r.foreach { row =>
      assert(row.getAs[Long]("recon_e6") == row.getAs[Long]("scaled_e6"),
        row.toString)
      val p = row.getAs[Long]("p_final_e6")
      assert(p >= 0L && p <= 1000000L, row.toString)
    }
    // scaled probabilities exhaust k per-mille mass exactly
    assert(r.map(_.getAs[Long]("scaled_e6")).sum ==
      AuditQueries.AliasK * 1000000L)
  }

  test("q506: greedy coverage is monotone with diminishing returns") {
    val r = rows("q506_coverage_select")
    assert(r.length == CurationQueries.CoverBudget)
    val gains = r.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("gain"))
    // submodularity: greedy marginal gains never increase
    assert(gains.sliding(2).forall(w => w(0) >= w(1)), gains.mkString(","))
    val h = r.maxBy(_.getAs[Long]("round"))
    assert(h.getAs[Long]("covered") <= h.getAs[Long]("universe"))
    assert(h.getAs[Long]("covered") == gains.sum)
    // ten distinct documents picked
    assert(r.map(_.getAs[Long]("doc_id")).distinct.length ==
      CurationQueries.CoverBudget)
  }

  test("q507: clustered SE is positive and the slope matches q429's pooled") {
    val r = rows("q507_cluster_robust")
    assert(r.length == 1)
    val h = r.head
    assert(h.getAs[Double]("se_cr1_e6_d") > 0.0)
    assert(h.getAs[Long]("n_clusters") > 1L)
    // same panel, same pooled estimator family: slope is finite e6
    assert(math.abs(h.getAs[Long]("slope_e6")) < 1000000000000L)
  }

  test("q508: the three binning rules are ordered sensibly and positive") {
    val r = rows("q508_bin_advisor")
    assert(r.length == 1)
    val h = r.head
    assert(h.getAs[Long]("iqr_c") > 0L)
    assert(h.getAs[Long]("sigma_c") > 0L)
    assert(h.getAs[Long]("w_fd_c") > 0L)
    assert(h.getAs[Long]("w_scott_c") > 0L)
    // Sturges is exactly ceil(log2 n) + 1 (LUT whole-bit grain agrees
    // with the real log at integer boundaries)
    val n = h.getAs[Long]("n_orders")
    val expect = 1 + math.ceil(math.log(n.toDouble) / math.log(2.0)).toLong
    assert(math.abs(h.getAs[Long]("bins_sturges") - expect) <= 1,
      s"sturges=${h.getAs[Long]("bins_sturges")} expect=$expect")
    assert(h.getAs[Long]("bins_fd") > 0L && h.getAs[Long]("bins_scott") > 0L)
  }

  test("q491: wins + losses + ties tile the pair space exactly") {
    val r = rows("q491_win_ratio")
    assert(r.length == 1)
    val h = r.head
    val pairs = h.getAs[Long]("n_a") * h.getAs[Long]("n_b")
    assert(h.getAs[Long]("wins") + h.getAs[Long]("losses") +
      h.getAs[Long]("ties") == pairs)
    val p = plan("q491_win_ratio")
    assert(!p.contains("CartesianProduct"), p)
  }
}
