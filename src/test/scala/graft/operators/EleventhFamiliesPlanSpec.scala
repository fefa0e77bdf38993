package graft.operators

import graft.SparkSpec

/** Plan pins + semantic invariants for the round-6 families (q509+):
  * the standing 100 TB posture assertions (no cartesians on fact
  * streams, bounded walks, metadata-scale lattices) plus the
  * in-output certificates each construction ships — Elo rating
  * conservation, cut-component reconstruction, composition-bound
  * crossover, LZ78 dictionary accounting, MoM admissibility.
  */
class EleventhFamiliesPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir).collect()

  test("q509: antisymmetric updates conserve total rating exactly") {
    val r = rows("q509_elo_replay")
    assert(r.length == 5)
    // zero-sum certificate: every match moves +delta/-delta
    assert(r.map(_.getAs[Long]("rating")).sum == 5 * 1000L)
    // every played match has exactly one winner
    assert(r.map(_.getAs[Long]("wins")).sum * 2 ==
      r.map(_.getAs[Long]("matches")).sum)
    assert(r.forall(row => row.getAs[Long]("wins") <=
      row.getAs[Long]("matches")))
  }

  test("q510: lattice scan is metadata-scale; components rebuild the cut") {
    val p = plan("q510_min_cut")
    assert(!p.contains("CartesianProduct"),
      s"the mask×edge scan must be a broadcast join, not a cartesian:\n$p")
    val r = rows("q510_min_cut")
    assert(r.length == 1)
    val row = r.head
    // reconstruction certificate: the three cut components sum exactly
    assert(row.getAs[Long]("cut_src") + row.getAs[Long]("cut_mid") +
      row.getAs[Long]("cut_snk") == row.getAs[Long]("min_cut"))
    // the all-sink-side cut (mask 0/0: every source edge) bounds the min,
    // and the runner-up (when present) sits strictly above it
    assert(row.getAs[Long]("min_cut") >= 0L)
    Option(row.getAs[java.lang.Long]("runner_up")).foreach(ru =>
      assert(ru > row.getAs[Long]("min_cut")))
    assert(row.getAs[Long]("n_optimal") >= 1L)
  }

  test("q511: advanced composition overtakes basic exactly at the crossover") {
    val r = rows("q511_dp_ledger")
    assert(r.length == 20)
    r.foreach { row =>
      val basic = row.getAs[Long]("eps_basic_e6")
      val adv = row.getAs[Long]("eps_adv_e6")
      val eff = row.getAs[Long]("eps_effective_e6")
      assert(eff == math.min(basic, adv))
      assert((row.getAs[String]("tighter") == "advanced") == (adv < basic))
      // basic composition is linear in k by construction
      assert(basic == row.getAs[Long]("k_queries") * AuditQueries.DpEps0E6)
    }
  }

  test("q512: phrase accounting is consistent with the parse") {
    val r = rows("q512_lz78")
    assert(r.length == 1)
    val row = r.head
    val len = row.getAs[Long]("seq_len")
    val ph = row.getAs[Long]("n_phrases")
    // every phrase consumes >= 1 char and the longest fits the stream
    assert(ph >= 1L && ph <= len)
    assert(row.getAs[Long]("max_phrase_len") >= 1L)
    assert(row.getAs[Long]("max_phrase_len") <= len)
    assert(row.getAs[Long]("phrase_rate_e6") == ph * 1000000L / len)
  }

  test("q514: KN smoothing moves mass exactly as the discount dictates") {
    val r = rows("q514_kneser_ney")
    assert(r.length == TextQueries.KnTopK)
    r.foreach { row =>
      val pMl = row.getAs[Long]("p_ml_e6")
      val pKn = row.getAs[Long]("p_kn_e6")
      val c12 = row.getAs[Long]("c12")
      assert(c12 >= 1L, "observed bigrams only — the max() is vacuous")
      // smoothing discounts the head: for the TOP bigrams the direct
      // term loses D/c1 and regains only the continuation share
      assert(pKn > 0L && pMl > 0L)
      assert(row.getAs[Long]("n1l") >= 1L && row.getAs[Long]("n1r") >= 1L)
      assert(row.getAs[Long]("n1l") <= row.getAs[Long]("btypes"))
    }
  }

  test("q515: Kraft equality and the Shannon band hold exactly") {
    val r = rows("q515_huffman")
    assert(r.length == TextQueries.HuffK)
    val maxL = r.map(_.getAs[Long]("code_len")).max
    // Kraft sum with the full prefix tree: sum 2^(Lmax-l) = 2^Lmax
    val kraft = r.map(row => 1L << (maxL - row.getAs[Long]("code_len"))).sum
    assert(kraft == (1L << maxL), s"Kraft sum $kraft != 2^$maxL")
    // expected length within one bit of the alphabet entropy
    val tot = r.map(_.getAs[Long]("freq")).sum.toDouble
    val lbar = r.map(row =>
      row.getAs[Long]("freq") * row.getAs[Long]("code_len")).sum / tot
    val h = r.map { row =>
      val p = row.getAs[Long]("freq") / tot
      -p * math.log(p) / math.log(2)
    }.sum
    assert(lbar >= h - 1e-9 && lbar < h + 1.0, s"L=$lbar H=$h")
  }

  test("q516: reversal symmetry doubles every optimum; lattice is metadata") {
    val p = plan("q516_tsp_circuit")
    assert(!p.contains("CartesianProduct"), p)
    val r = rows("q516_tsp_circuit")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_tours") == 720L, "(7-1)! tours scanned")
    // symmetric leg costs: every optimal tour's reversal is optimal too
    assert(row.getAs[Long]("n_optimal") >= 2L &&
      row.getAs[Long]("n_optimal") % 2 == 0L)
    Option(row.getAs[java.lang.Long]("runner_up")).foreach(ru =>
      assert(ru > row.getAs[Long]("tour_cost")))
  }

  test("q517: Erdős–Szekeres holds and the runs fit the series") {
    val r = rows("q517_lis_lds")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val lis = row.getAs[Long]("lis_len")
    val lds = row.getAs[Long]("lds_len")
    assert(row.getAs[Long]("erdos_product") == lis * lds)
    assert(lis * lds >= n, "Erdős–Szekeres is an identity, not a heuristic")
    assert(row.getAs[Long]("erdos_ok") == 1L)
    assert(lis >= 1L && lis <= n && lds >= 1L && lds <= n)
  }

  test("q518: the stop rule's pick is consistent with its threshold") {
    val r = rows("q518_secretary")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val obs = row.getAs[Long]("n_observed")
    assert(obs == n * 367879L / 1000000L, "observation window is n/e")
    if (row.getAs[Long]("beat_threshold") == 1L)
      assert(row.getAs[Long]("chosen_value_c") > row.getAs[Long]("threshold_c"))
    assert(row.getAs[Long]("chosen_rank") >= 1L &&
      row.getAs[Long]("chosen_rank") <= n)
    assert((row.getAs[Long]("success") == 1L) ==
      (row.getAs[Long]("chosen_rank") == 1L))
  }

  test("q519: the skyline is mutually non-dominated and nothing above it") {
    val r = rows("q519_skyline")
    assert(r.nonEmpty)
    val pts = r.map(row =>
      (row.getAs[Long]("price_c"), row.getAs[Long]("size")))
    // pairwise: no frontier point dominates another
    for (a <- pts; b <- pts if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates $b inside the frontier")
    // frontier is a strictly decreasing staircase in (price, size)
    val dedup = pts.distinct.sortBy(_._1).toSeq
    dedup.sliding(2).foreach {
      case Seq((p1, s1), (p2, s2)) => assert(p1 < p2 && s1 < s2)
      case _ =>
    }
  }

  test("q520: greedy selection accounting is internally consistent") {
    val r = rows("q520_interval_schedule")
    assert(r.length == 1)
    val row = r.head
    val sel = row.getAs[Long]("n_selected")
    assert(sel >= 1L && sel <= row.getAs[Long]("n_intervals"))
    val span = row.getAs[Long]("last_end_day") - row.getAs[Long]("first_start_day")
    assert(row.getAs[Long]("busy_days") <= span.max(0L) ||
      sel == 1L, "selected busy time fits the selected span")
    if (span > 0)
      assert(row.getAs[Long]("utilization_e6") ==
        row.getAs[Long]("busy_days") * 1000000L / span)
  }

  test("q521: the coverage radius ladder never widens") {
    val r = rows("q521_kcenter_greedy").sortBy(_.getAs[Long]("k"))
    assert(r.length == SimilarityQueries.KCenterK)
    assert(r.map(_.getAs[Long]("vec_id")).distinct.length == r.length,
      "centers are distinct")
    val radii = r.drop(1).map(_.getAs[Long]("radius2")).toSeq
    radii.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a,
        "each added center can only shrink the farthest gap")
      case _ =>
    }
    assert(radii.forall(_ > 0L))
  }

  test("q522: local alignment score sits in its provable band") {
    val r = rows("q522_smith_waterman")
    assert(r.length == 1)
    val row = r.head
    val best = row.getAs[Long]("best_score")
    val minLen = math.min(row.getAs[Long]("len_a"), row.getAs[Long]("len_b"))
    // zero-floored cells: never negative; match-run bound from above
    assert(best >= 0L && best <= EventQueries.SwMatch * minLen)
    // the event alphabet is tiny, so two 48-char streams must share
    // at least one character — a positive local alignment exists
    assert(best > 0L)
    assert(row.getAs[Long]("normalized_e6") ==
      best * 1000000L / (EventQueries.SwMatch * minLen))
  }

  test("q523: Page moments are the closed forms; L sits in its range") {
    val r = rows("q523_page_trend")
    assert(r.length == 1)
    val row = r.head
    val b = row.getAs[Long]("b_blocks")
    assert(row.getAs[Long]("mu_l") == 45L * b)
    assert(row.getAs[Long]("var_l") == 25L * b)
    val l = row.getAs[Long]("l_stat")
    // extreme orderings: perfectly reversed 35b <= L <= perfectly agreeing 55b
    assert(l >= 35L * b && l <= 55L * b)
  }

  test("q524: RD intercepts are the boundary values of their own fits") {
    val r = rows("q524_regression_discontinuity")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_left") > 0L && row.getAs[Long]("n_right") > 0L)
    assert(row.getAs[Long]("rd_effect_e6") ==
      row.getAs[Long]("b0_right_e6") - row.getAs[Long]("b0_left_e6"))
  }

  test("q525: every treated order finds a control; the gap is a distance") {
    val r = rows("q525_nn_matching")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_treated") > 0L)
    assert(row.getAs[Long]("n_controls") > 0L)
    assert(row.getAs[Long]("mean_gap_c") >= 0L,
      "nearest-neighbor distance is nonnegative by construction")
  }

  test("q526: the DP dominates q520's unweighted pick count in value") {
    val r = rows("q526_weighted_schedule")
    assert(r.length == 1)
    val row = r.head
    val best = row.getAs[Long]("best_value_c")
    val total = row.getAs[Long]("total_weight_c")
    // optimal substructure certificates: 0 < best <= total weight
    assert(best > 0L && best <= total)
    assert(row.getAs[Long]("kept_frac_e6") == best * 1000000L / total)
  }

  test("q527: Kelly fraction and growth are sign-consistent") {
    val r = rows("q527_kelly")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("up_days") > 0L && row.getAs[Long]("down_days") > 0L)
    val f = row.getAs[Long]("f_e6")
    assert(f >= 0L && f < 1000000L, "stake is a fraction of bankroll")
    if (row.getAs[Long]("has_edge") == 0L)
      assert(f == 0L, "no edge → no stake, never a fabricated bet")
    // betting the Kelly fraction never has negative expected log-growth
    // in exact arithmetic; the e6 LUT logs and the floored f introduce
    // up to ~0.01 nat of quantization, so the pin allows that slack
    if (f > 0L) assert(row.getAs[Long]("g_e6") >= -10000L)
  }

  test("q528: the tank estimate is bracketed by the observed sample") {
    val r = rows("q528_german_tank")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("sample_k") > 0L)
    // the estimator can never undershoot its own observed maximum
    assert(row.getAs[Long]("n_hat") >= row.getAs[Long]("sample_max"))
    assert(row.getAs[Long]("true_max") >= row.getAs[Long]("sample_max"))
  }

  test("q529: full coverage needs at least one draw per coupon") {
    val r = rows("q529_coupon_collector")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_seen")
    assert(n == 25L, "all nations appear in the order stream")
    assert(row.getAs[Long]("actual_draws") >= n)
    // expected = n * H_n exceeds n log n for n = 25
    assert(row.getAs[Long]("expected_draws_e6") > n * 1000000L)
  }

  test("q530: win and ruin probabilities partition certainty") {
    val r = rows("q530_gamblers_ruin")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("pwin_e6") + row.getAs[Long]("pruin_e6")
      == 1000000L)
    assert(row.getAs[Long]("pwin_e6") >= 0L &&
      row.getAs[Long]("pwin_e6") <= 1000000L)
    // more down-days than up-days → r > 1 → win prob below the fair half
    val rr = row.getAs[Long]("r_e6")
    val pw = row.getAs[Long]("pwin_e6")
    if (rr > 1000000L) assert(pw <= 500000L)
    if (rr < 1000000L) assert(pw >= 500000L)
  }

  test("q531: CV ladder components reconstruct the bullwhip ratio") {
    val r = rows("q531_bullwhip")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("var_placed_e6") >= 0L &&
      row.getAs[Long]("var_shipped_e6") >= 0L)
    assert(row.getAs[Long]("cv2_placed_e6") > 0L &&
      row.getAs[Long]("cv2_shipped_e6") > 0L)
    assert(row.getAs[Long]("bullwhip_e6") ==
      row.getAs[Long]("cv2_placed_e6") * 1000000L /
        row.getAs[Long]("cv2_shipped_e6"))
  }

  test("q536: both reconciliations are coherent by construction") {
    val r = rows("q536_forecast_reconcile")
    assert(r.nonEmpty)
    r.foreach { row =>
      // top-down nation splits rebuild the region forecast EXACTLY
      assert(row.getAs[Long]("td_coherent") == 1L)
      assert(row.getAs[Long]("td_sum_c") == row.getAs[Long]("td_region_c"))
      assert(row.getAs[Long]("err_bu_c") >= 0L &&
        row.getAs[Long]("err_td_c") >= 0L)
      assert(row.getAs[Long]("bu_c") >= 0L)
    }
  }

  test("q532: the integer 3-sigma test never flags both sides at once") {
    val r = rows("q532_p_chart")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_out_high") + row.getAs[Long]("n_out_low")
      <= row.getAs[Long]("n_days"))
    assert(row.getAs[Long]("pbar_e6") > 0L &&
      row.getAs[Long]("pbar_e6") < 1000000L)
    assert(row.getAs[Long]("total_returned") <= row.getAs[Long]("total_lines"))
  }

  test("q533: stemming is a function — the type space can only shrink") {
    val r = rows("q533_stemmer")
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Long]("types_after") <= row.getAs[Long]("types_before"))
      assert(row.getAs[Long]("types_before") <= row.getAs[Long]("n_tokens"))
      assert(row.getAs[Long]("reduction_e6") >= 0L)
    }
    // no rules-must-fire assertion: the synthetic fixture's 31-token
    // vocabulary happens to contain no s/ed/ing merge pairs — pin the
    // function identity (monotone, nonnegative), not fixture folklore
  }

  test("q534: the first day is always a record; counts fit the series") {
    val r = rows("q534_record_stats")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val rec = row.getAs[Long]("n_records")
    assert(rec >= 1L && rec <= n)
    // H_n(2) < H_n always; both positive
    assert(row.getAs[Long]("h2_e6") < row.getAs[Long]("h1_e6"))
    assert(row.getAs[Long]("h1_e6") > 0L)
  }

  test("q535: the Allan ladder is positive with the block accounting right") {
    val r = rows("q535_allan_variance").sortBy(_.getAs[Long]("tau"))
    assert(r.map(_.getAs[Long]("tau")).toSeq ==
      AuditQueries.AllanTaus.map(_.toLong))
    r.foreach { row =>
      assert(row.getAs[Long]("avar_dollars2") >= 0L)
      assert(row.getAs[Long]("m_blocks") >= 2L)
    }
    // block counts halve (to within truncation) as tau doubles
    val m = r.map(_.getAs[Long]("m_blocks"))
    m.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a / 2 + 1)
      case _ =>
    }
  }

  test("q513: MoM fit is admissible exactly on the overdispersed groups") {
    val r = rows("q513_neg_binomial")
    assert(r.length == 5)
    r.foreach { row =>
      val over = row.getAs[Long]("overdispersed") == 1L
      assert(over == (row.getAs[Long]("var_e6") > row.getAs[Long]("mean_e6")))
      val rE6 = Option(row.getAs[java.lang.Long]("r_e6"))
      val pE6 = Option(row.getAs[java.lang.Long]("p_e6"))
      assert(rE6.isDefined == over && pE6.isDefined == over,
        "r/p exist iff the group is overdispersed")
      // p = m/s² lands strictly inside (0, 1) when defined
      pE6.foreach(p => assert(p > 0L && p < 1000000L))
      rE6.foreach(rv => assert(rv > 0L))
    }
  }
}
