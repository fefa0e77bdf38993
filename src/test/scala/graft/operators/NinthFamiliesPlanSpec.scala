package graft.operators

import graft.SparkSpec

/** Plan pins + semantic invariants for the ninth-session families
  * (q427–q448) — the same 100 TB posture assertions
  * NewFamiliesPlanSpec holds for the eighth session: pushed filters,
  * pruned scans, partial aggregation, broadcast-only metadata joins,
  * no cartesians; plus output-level certificates for the two
  * combinatorial drivers (stable matching, knapsack) whose physical
  * plan is a driver fold by design.
  */
class NinthFamiliesPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q427: tail-dependence prunes lineitem to quantity+price") {
    val p = plan("q427_tail_dependence")
    assert(!p.contains("l_suppkey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q431: KPSS statistic is nonnegative with a coherent verdict") {
    // the day rollup is checkpointed, so the scan-side assertions live
    // in the oracle gate; pin the statistic's sign/verdict contract
    val r = graft.SparkEntry.queries("q431_kpss")(spark, sfDir).collect()
    assert(r.length == 1)
    val eta = r.head.getAs[Long]("kpss_eta_e6")
    val v = r.head.getAs[String]("verdict_5pct")
    assert(eta >= 0L)
    assert(if (eta > 463000L) v == "reject_level_stationarity"
      else v == "consistent")
  }

  test("q433: shift-share broadcasts both dims, no cartesian") {
    val p = plan("q433_shift_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q434: Bray-Curtis pair pass stays on the rollup, no cartesian") {
    val p = plan("q434_bray_curtis")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q435: Mantel permutation spine is broadcast-only") {
    val p = plan("q435_mantel_test")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q436: ordinal panel keeps the orders scan two-column") {
    val p = plan("q436_ordinal_assoc")
    assert(!p.contains("o_orderdate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q441: Jonckheere folds the contingency map-side") {
    val p = plan("q441_jonckheere")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q443: Cliff's delta pair accounting is complete and bounded") {
    val r = graft.SparkEntry.queries("q443_cliffs_delta")(spark, sfDir)
      .collect().head
    val n1 = r.getAs[Long]("n_returned"); val n2 = r.getAs[Long]("n_regular")
    assert(r.getAs[Long]("pairs_gt") + r.getAs[Long]("pairs_lt") +
      r.getAs[Long]("pairs_tied") == n1 * n2,
      "every cross pair must be classified exactly once")
    val d = r.getAs[Long]("cliffs_delta_e6")
    assert(d >= -1000000L && d <= 1000000L)
    val a = r.getAs[Long]("vargha_delaney_a_e6")
    assert(a >= 0L && a <= 1000000L)
  }

  test("q444: Cucconi statistic is nonnegative (it is a quadratic form)") {
    val r = graft.SparkEntry.queries("q444_cucconi")(spark, sfDir)
      .collect().head
    assert(r.getAs[Double]("c_d") >= 0.0)
  }

  test("q445: Cochrane-Orcutt month rollup prunes to date+price") {
    val p = plan("q445_cochrane_orcutt")
    assert(!p.contains("o_custkey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q446: Oaxaca-Blinder joins the customer dim broadcast") {
    val p = plan("q446_oaxaca_blinder")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q448: Lin CCC folds both halves in one fact pass") {
    val p = plan("q448_lin_ccc")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q440: matching is perfect, stable, proposer-rank consistent") {
    val out = graft.SparkEntry.queries("q440_stable_matching")(spark, sfDir)
      .collect()
    assert(out.length == AuditQueries.GsG)
    assert(out.map(_.getAs[Long]("nationkey")).distinct.length ==
      AuditQueries.GsG, "matching must be a bijection")
    assert(out.forall(_.getAs[Long]("blocking_pairs") == 0L),
      "Gale-Shapley output must certify zero blocking pairs")
  }

  test("q447: knapsack frontier is monotone and capacity-bounded") {
    val out = graft.SparkEntry.queries("q447_knapsack")(spark, sfDir)
      .orderBy("capacity_hundreds").collect()
      .map(_.getAs[Long]("best_value"))
    assert(out.length == AuditQueries.KnapCap + 1)
    assert(out.head == 0L, "zero capacity holds nothing")
    assert(out.zip(out.tail).forall { case (a, b) => a <= b },
      "the DP value frontier must be non-decreasing in capacity")
  }

  test("q449: Fisher exact p is a probability and a-obs is feasible") {
    val r = graft.SparkEntry.queries("q449_fisher_exact")(spark, sfDir)
      .collect().head
    val p = r.getAs[Long]("p_one_sided_e6")
    assert(p >= 0L && p <= 1000000L)
    assert(r.getAs[Long]("a_observed") <=
      math.min(r.getAs[Long]("k_region0"), r.getAs[Long]("n_high_aov")))
  }

  test("q450: Wald IV runs on one shuffle pair, no cartesian") {
    val p = plan("q450_wald_iv")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q451: RD jump equals the intercept difference in-output") {
    val r = graft.SparkEntry
      .queries("q451_regression_discontinuity")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("jump_e6") ==
      r.getAs[Long]("alpha_right_e6") - r.getAs[Long]("alpha_left_e6"))
  }

  test("q452: Wagner-Whitin cost-to-horizon is positive and monotone") {
    val out = graft.SparkEntry.queries("q452_wagner_whitin")(spark, sfDir)
      .orderBy("month_idx").collect()
      .map(_.getAs[Long]("min_cost_to_month"))
    assert(out.head > 0L, "one month of demand still pays one setup")
    assert(out.zip(out.tail).forall { case (a, b) => a <= b },
      "serving a longer horizon can never get cheaper")
  }

  test("q453: Holt-Winters emits exactly the 12-month forecast vector") {
    val out = graft.SparkEntry.queries("q453_holt_winters")(spark, sfDir)
      .orderBy("horizon").collect()
    assert(out.map(_.getAs[Long]("horizon")).toSeq == (1L to 12L).toSeq)
  }

  test("q454: Dunn panel covers all 10 priority pairs with coherent flags") {
    val out = graft.SparkEntry.queries("q454_dunn_test")(spark, sfDir)
      .collect()
    assert(out.length == 10)
    assert(out.forall { r =>
      val sig = r.getAs[String]("bonferroni_5pct") == "different"
      sig == (math.abs(r.getAs[Double]("z_d")) > 2.807)
    })
  }

  test("q455: Viterbi decode is a feasible path with negative log-score") {
    val r = graft.SparkEntry.queries("q455_viterbi_hmm")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_high_days") <= n)
    assert(r.getAs[Long]("n_switches") <= n - 1)
    assert(r.getAs[Long]("viterbi_score_e6") < 0L,
      "a log-probability score is strictly negative")
  }

  test("q456: Bland-Altman limits bracket the bias") {
    val r = graft.SparkEntry.queries("q456_bland_altman")(spark, sfDir)
      .collect().head
    assert(r.getAs[Double]("loa_low_d") < r.getAs[Double]("loa_high_d"))
    assert(r.getAs[Long]("n_outside") <= r.getAs[Long]("n_brands"))
  }

  test("q457: Deming slope counteracts OLS attenuation") {
    val r = graft.SparkEntry.queries("q457_deming")(spark, sfDir)
      .collect().head
    val ols = r.getAs[Long]("beta_ols_e6") / 1e6
    val deming = r.getAs[Double]("deming_slope_d")
    assert(ols > 0.0 && deming >= ols,
      s"with positive association Deming >= OLS: $deming vs $ols")
  }

  test("q458: Theta method emits the full horizon vector") {
    val out = graft.SparkEntry.queries("q458_theta_method")(spark, sfDir)
      .orderBy("horizon").collect()
    assert(out.map(_.getAs[Long]("horizon")).toSeq == (1L to 6L).toSeq)
    assert(out.forall(_.getAs[Long]("forecast_e6") > 0L),
      "revenue forecasts must stay positive on this data")
  }

  test("q459: credibility premium is a convex blend of own and grand mean") {
    val rows = graft.SparkEntry.queries("q459_buhlmann")(spark, sfDir)
      .collect()
    assert(rows.forall { r =>
      val z = r.getAs[Double]("z_d"); z > 0.0 && z < 1.0
    }, "credibility weights must lie strictly inside (0,1)")
  }

  test("q460: Rayleigh z is nonnegative and the peak month is a month") {
    val r = graft.SparkEntry.queries("q460_rayleigh")(spark, sfDir)
      .collect().head
    assert(r.getAs[Double]("rayleigh_z_d") >= 0.0)
    val pm = r.getAs[Long]("peak_month")
    assert(pm >= 1L && pm <= 12L)
  }

  test("q461: both power indices normalize and follow the weights") {
    val rows = graft.SparkEntry.queries("q461_power_indices")(spark, sfDir)
      .orderBy("voter_rank").collect()
    val g = rows.length
    val bz = rows.map(_.getAs[Long]("banzhaf_e6")).sum
    val ss = rows.map(_.getAs[Long]("shapley_shubik_e6")).sum
    assert(math.abs(bz - 1000000L) <= g, s"Banzhaf must sum to ~1e6: $bz")
    assert(math.abs(ss - 1000000L) <= g,
      s"Shapley-Shubik must sum to ~1e6: $ss")
    val byW = rows.sortBy(-_.getAs[Long]("weight"))
      .map(_.getAs[Long]("banzhaf_e6"))
    assert(byW.zip(byW.tail).forall { case (a, b) => a >= b },
      "a heavier voter can never hold less Banzhaf power")
  }

  test("q462: the fully developed cohort is exact under both methods") {
    val rows = graft.SparkEntry
      .queries("q462_bornhuetter_ferguson")(spark, sfDir)
      .orderBy("order_year").collect()
    val oldest = rows.head
    assert(oldest.getAs[Long]("cl_err_e6") == 0L,
      "chain ladder is exact when nothing is left to develop")
    assert(oldest.getAs[Long]("bf_err_e6") == 0L,
      "BF adds q = 0 unreported share for a complete cohort")
  }

  test("q463: Borda mass is conserved and Condorcet winners are unique") {
    val rows = graft.SparkEntry.queries("q463_social_choice")(spark, sfDir)
      .collect()
    val k = rows.length.toLong
    assert(rows.map(_.getAs[Long]("borda")).sum == 12L * k * (k - 1) / 2,
      "every ballot hands out 0..k-1 points exactly once")
    assert(rows.map(_.getAs[Long]("is_condorcet_winner")).sum <= 1L,
      "at most one brand can beat every rival head-to-head")
  }

  test("q464: the concentration index is bounded by the Gini") {
    val r = graft.SparkEntry
      .queries("q464_concentration_index")(spark, sfDir).collect().head
    val gini = r.getAs[Long]("gini_e6")
    assert(gini >= 0L && gini <= 1000000L)
    assert(math.abs(r.getAs[Long]("ci_e6")) <= gini,
      "re-ranking by a different variable can only shrink concentration")
  }

  test("q465: FGT ladder is monotone and Sen sits inside [FGT1, FGT0]") {
    val r = graft.SparkEntry.queries("q465_fgt_sen")(spark, sfDir)
      .collect().head
    val h = r.getAs[Long]("fgt0_e6"); val g1 = r.getAs[Long]("fgt1_e6")
    val g2 = r.getAs[Long]("fgt2_e6")
    assert(h >= g1 && g1 >= g2,
      "squared gaps can never exceed gaps, gaps never exceed headcount")
    val sen = r.getAs[Double]("sen_index_d")
    assert(sen >= g1 / 1e6 - 1e-9 && sen <= h / 1e6 + 1e-9,
      s"Sen must interpolate the FGT bracket: $sen vs [$g1, $h]")
  }

  test("q466: the bottom half holds at most half the mass") {
    val r = graft.SparkEntry.queries("q466_wolfson")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("bottom_half_share_e6") <= 500000L)
    val g = r.getAs[Double]("gini_d")
    assert(g >= 0.0 && g <= 1.0)
  }

  test("q467: Page's L sees 12 blocks of 5 ordered treatments") {
    val r = graft.SparkEntry.queries("q467_page_l")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_blocks") == 12L)
    assert(r.getAs[Long]("n_priorities") == 5L)
  }

  test("q468: all four polynomial contrasts report") {
    val out = graft.SparkEntry.queries("q468_poly_contrasts")(spark, sfDir)
      .collect()
    assert(out.map(_.getAs[String]("contrast")).sorted.toSeq ==
      Seq("cubic", "linear", "quadratic", "quartic"))
    assert(out.forall(_.getAs[Double]("ss_contrast_d") >= 0.0))
  }

  test("q469: Bass fit recovers a positive innovation rate") {
    val r = graft.SparkEntry.queries("q469_bass_diffusion")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_months") >= 24L)
    assert(r.getAs[Double]("p_innovation_d") > 0.0,
      "acquisition starts from somewhere: p > 0")
  }

  test("q470: non-additivity SS is a nonnegative one-df component") {
    val r = graft.SparkEntry
      .queries("q470_tukey_nonadditivity")(spark, sfDir).collect().head
    assert(r.getAs[Double]("ss_nonadditivity_d") >= 0.0)
    assert(r.getAs[Long]("n_months") == 12L)
  }

  test("q471: Kuiper V dominates either one-sided deviation") {
    val r = graft.SparkEntry.queries("q471_circular_panel")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("kuiper_v_e6") >= 0L)
    val m = r.getAs[Long]("hodges_m")
    assert(m >= 0L && m <= r.getAs[Long]("n_orders") / 2 + 1)
  }

  test("q472: Cpk never exceeds Cp and the ppm census is a proportion") {
    val r = graft.SparkEntry
      .queries("q472_process_capability")(spark, sfDir).collect().head
    assert(r.getAs[Double]("cpk_d") <= r.getAs[Double]("cp_d") + 1e-12,
      "centering can only lose capability")
    val ppm = r.getAs[Long]("observed_oos_ppm")
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("q473: DM verdict is coherent with the statistic's sign") {
    val r = graft.SparkEntry
      .queries("q473_diebold_mariano")(spark, sfDir).collect().head
    val dm = r.getAs[Double]("dm_stat_d")
    val v = r.getAs[String]("verdict_5pct")
    assert(if (dm > 1.96) v == "seasonal_naive_better"
      else if (dm < -1.96) v == "naive_better"
      else v == "no_significant_difference")
  }

  test("q474: MZ regression aligns 12-month-lag forecast pairs") {
    val r = graft.SparkEntry
      .queries("q474_mincer_zarnowitz")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_forecasts") >= 24L)
    assert(r.getAs[Double]("mz_f_d") >= 0.0)
  }

  test("q475: directional hit count is bounded by the sign count") {
    val r = graft.SparkEntry
      .queries("q475_directional_skill")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_signs"))
    assert(r.getAs[Double]("theil_u2_d") >= 0.0)
  }

  test("q476: Ansari-Bradley permutation p has 1/20 resolution") {
    val r = graft.SparkEntry
      .queries("q476_ansari_bradley")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_perm") == 19L)
    val p = r.getAs[Long]("p_e6")
    assert(p >= 50000L && p <= 1000000L,
      "p = (1+n_ge)/20 lives on the 1/20 lattice")
  }

  test("q477: Quade F is nonnegative with the full 12x5 grid") {
    val r = graft.SparkEntry.queries("q477_quade")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_blocks") == 12L)
    assert(r.getAs[Long]("n_treatments") == 5L)
    assert(r.getAs[Long]("quade_f_e6") >= 0L)
  }

  test("q478: distance correlation lives in [0, 1]") {
    val r = graft.SparkEntry
      .queries("q478_distance_correlation")(spark, sfDir).collect().head
    val dcor = r.getAs[Double]("dcor_d")
    assert(dcor >= 0.0 && dcor <= 1.0 + 1e-9,
      s"dCor is a normalized dependence measure: $dcor")
    assert(r.getAs[Double]("dcov2_d") >= -1e-12,
      "the dCov^2 numerator is a squared-type quantity")
  }

  test("q479: PERMANOVA keeps within-SS at most total-SS") {
    val r = graft.SparkEntry.queries("q479_permanova")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_regions") >= 2L)
    assert(r.getAs[Double]("pseudo_f_d") >= 0.0)
    assert(r.getAs[Long]("n_perm") == 19L)
  }

  test("q480: Hodges-Lehmann shift stays inside the support range") {
    val r = graft.SparkEntry.queries("q480_hodges_lehmann")(spark, sfDir)
      .collect().head
    val hl = r.getAs[Long]("hl_shift")
    assert(hl >= -49L && hl <= 49L,
      "a quantity shift cannot exceed the support width")
    assert(r.getAs[Long]("n_pairs") ==
      r.getAs[Long]("n_returned") * r.getAs[Long]("n_regular"))
  }

  test("q481: ESD rounds shrink the deviate or keep it comparable") {
    val out = graft.SparkEntry.queries("q481_rosner_esd")(spark, sfDir)
      .orderBy("round").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("nation")).distinct.length == 3,
      "each round must remove a different nation")
    assert(out.forall(_.getAs[Double]("r_stat_d") >= 0.0))
  }

  test("q482: Siegel slope stays finite and alpha reconstructs a level") {
    val r = graft.SparkEntry.queries("q482_siegel_slope")(spark, sfDir)
      .collect().head
    assert(!r.getAs[Double]("beta_d").isNaN)
    assert(!r.getAs[Double]("alpha_d").isNaN)
  }

  test("q483: trimmed means sit inside the quantity support") {
    val r = graft.SparkEntry.queries("q483_yuen_test")(spark, sfDir)
      .collect().head
    val t1 = r.getAs[Double]("trimmed_mean_returned_d")
    val t0 = r.getAs[Double]("trimmed_mean_regular_d")
    assert(t1 >= 1.0 && t1 <= 50.0)
    assert(t0 >= 1.0 && t0 <= 50.0)
  }

  test("q437: Bradley-Terry strengths normalize to mean 1e6 and rank") {
    val out = graft.SparkEntry.queries("q437_bradley_terry")(spark, sfDir)
      .collect()
    val g = out.length
    val total = out.map(_.getAs[Long]("pi_e6")).sum
    assert(math.abs(total - g * 1000000L) <= g,
      s"normalized strengths must sum to ~g*1e6 (floor drift <= g): $total")
    assert(out.map(_.getAs[Long]("rnk")).sorted.toSeq ==
      (1L to g.toLong).toSeq, "ranks must be a permutation")
  }
}
