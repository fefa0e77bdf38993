package graft.operators

import graft.SparkSpec

/** Plan pins + semantic certificates for the storage-layout advisor family
  * (q537–q540): block-count lower bounds that hold by construction of the
  * fixed-block layout model, encoding-size identities, and the stitch
  * certificate (clustered RLE runs = NDV).
  */
class LayoutAdvisorSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir).collect()

  test("q537: block counts respect the 512-row capacity bound; no cartesian") {
    val p = plan("q537_zorder_locality")
    assert(!p.contains("CartesianProduct"),
      s"rect probe must broadcast, not cartesian:\n$p")
    val r = rows("q537_zorder_locality")
    assert(r.length == 6)
    r.foreach { row =>
      val hit = row.getAs[Long]("rows_hit")
      val rm = row.getAs[Long]("blocks_rowmajor")
      val zo = row.getAs[Long]("blocks_zorder")
      assert(hit > 0 && rm >= 1 && zo >= 1)
      // each block holds <= 512 rows, so touched blocks >= ceil(hit/512)
      assert(rm >= (hit + 511) / 512, s"rm=$rm hit=$hit")
      assert(zo >= (hit + 511) / 512, s"zo=$zo hit=$hit")
      assert(row.getAs[Long]("zo_vs_rm_e6") == zo * 1000000L / rm)
    }
  }

  test("q538: sorted keys pack tightest; size identity holds per config") {
    val r = rows("q538_delta_bitpack")
    assert(r.length == 3)
    val byCfg = r.map(x => x.getAs[String]("config") -> x).toMap
    r.foreach { row =>
      assert(row.getAs[Long]("plain_bits") == row.getAs[Long]("n_vals") * 64)
      // header floor: every block pays first value + min-delta + width byte
      assert(row.getAs[Long]("packed_bits") >=
        row.getAs[Long]("n_blocks") * 136)
    }
    // a sorted key's deltas are tiny; a random-by-key value's are not
    assert(byCfg("orderkey_sorted").getAs[Long]("packed_bits") <
      byCfg("orderdate_by_key").getAs[Long]("packed_bits"))
    assert(byCfg("orderdate_by_key").getAs[Long]("packed_bits") <
      byCfg("totalprice_by_key").getAs[Long]("packed_bits"))
  }

  test("q539: the winner label matches the arg-min of the three costs") {
    val r = rows("q539_rice_postings")
    assert(r.length == 11)
    r.foreach { row =>
      val rice = row.getAs[Long]("rice_bits")
      val gamma = row.getAs[Long]("gamma_bits")
      val fixed = row.getAs[Long]("fixed_bits")
      val best = math.min(rice, math.min(gamma, fixed))
      val w = row.getAs[String]("winner")
      assert((w == "rice" && rice == best) ||
        (w == "gamma" && gamma == best) || (w == "fixed32" && fixed == best))
      // every gap costs >= 1 bit under gamma; fixed is exactly 32/posting
      assert(gamma >= row.getAs[Long]("df"))
      assert(fixed == row.getAs[Long]("df") * 32)
    }
    assert(r.count(_.getAs[String]("term") == "~TOTAL") == 1)
  }

  test("q541: the deeper tail is never better than the shallower one") {
    val r = rows("q541_cvar")
    assert(r.length == 2)
    val byA = r.map(x => x.getAs[Long]("alpha") -> x).toMap
    r.foreach { row =>
      // CVaR is the mean of the tail whose max is VaR
      assert(row.getAs[Long]("cvar_c") <= row.getAs[Long]("var_c"))
      assert(row.getAs[Long]("m") >= 1)
      assert(row.getAs[Long]("m") <= row.getAs[Long]("n_days"))
    }
    // the 99% tail is a subset of the 95% tail: worse VaR, worse CVaR
    assert(byA(99L).getAs[Long]("var_c") <= byA(95L).getAs[Long]("var_c"))
    assert(byA(99L).getAs[Long]("cvar_c") <= byA(95L).getAs[Long]("cvar_c"))
    assert(byA(99L).getAs[Long]("m") <= byA(95L).getAs[Long]("m"))
  }

  test("q542: the choice label matches the bit comparison; flags pick dict") {
    val r = rows("q542_dict_advisor")
    assert(r.length == 7)
    r.foreach { row =>
      val d = row.getAs[Long]("dict_bits")
      val p = row.getAs[Long]("plain_bits")
      assert((row.getAs[String]("choice") == "dict") == (d < p))
      assert(row.getAs[Long]("ndv") <= row.getAs[Long]("n"))
      // code width is exactly ceil(log2 ndv) for ndv >= 2
      val ndv = row.getAs[Long]("ndv")
      if (ndv >= 2) assert(row.getAs[Long]("code_width") ==
        64 - java.lang.Long.numberOfLeadingZeros(ndv - 1))
    }
    // a 3-value flag over the fact table is the canonical dict win
    assert(r.find(_.getAs[String]("column_name") == "lineitem.l_returnflag")
      .get.getAs[String]("choice") == "dict")
  }

  test("q543: prefix lengths are bounded by the terms themselves") {
    val r = rows("q543_front_coding")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_terms") >= 1)
    assert(row.getAs[Long]("front_bytes") >= row.getAs[Long]("n_terms") * 2)
    assert(row.getAs[Long]("avg_cpl_e3") <= row.getAs[Long]("max_cpl") * 1000)
    assert(row.getAs[Long]("saved_e6") ==
      (row.getAs[Long]("plain_bytes") - row.getAs[Long]("front_bytes")) *
        1000000L / row.getAs[Long]("plain_bytes"))
  }

  test("q544: occupancy and false positives respect the filter geometry") {
    val r = rows("q544_bloom_advisor")
    assert(r.length == 1)
    val row = r.head
    val m = row.getAs[Long]("m_bits")
    val bits = row.getAs[Long]("bits_set")
    assert(bits >= 1 && bits <= m)
    // k=2 hashes insert at most 2 distinct positions per build key
    assert(bits <= 2 * row.getAs[Long]("n_build"))
    assert(row.getAs[Long]("false_pos") <= row.getAs[Long]("n_probe"))
    assert(row.getAs[Long]("fpp_pred_e6") == bits * bits * 1000000L / (m * m))
  }

  test("q549: static hits are monotone in K and never beat the ceiling") {
    val r = rows("q549_result_cache")
    assert(r.length == 3)
    val sorted = r.sortBy(_.getAs[Long]("k"))
    sorted.foreach { row =>
      assert(row.getAs[Long]("hits") <= row.getAs[Long]("ceiling_hits"))
      assert(row.getAs[Long]("hit_rate_e6") <=
        row.getAs[Long]("ceiling_rate_e6"))
    }
    // more capacity never hurts a static policy
    assert(sorted.map(_.getAs[Long]("hits")).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    // capacity >= ndv captures the whole ceiling
    sorted.filter(row => row.getAs[Long]("k") >=
      row.getAs[Long]("ndv_signatures")).foreach(row =>
      assert(row.getAs[Long]("hits") == row.getAs[Long]("ceiling_hits")))
  }

  test("q550: packing conserves rows and cannot grow the file count") {
    val r = rows("q550_compaction_advisor")
    assert(r.length == 1)
    val row = r.head
    val total = row.getAs[Long]("total_rows")
    val target = row.getAs[Long]("target_rows")
    assert(row.getAs[Long]("packed_files") == (total + target - 1) / target)
    // each day opens at least one post-compaction file
    assert(row.getAs[Long]("avg_files_per_day_e3") >= 1000L)
    assert(row.getAs[Long]("small_files") <= row.getAs[Long]("current_files"))
    assert(row.getAs[Long]("p50_file_rows") >= 1)
  }

  test("q551: finer grain prunes at least as well but costs partitions") {
    val r = rows("q551_partition_granularity")
    val daily = r.filter(_.getAs[String]("grain") == "daily")
    val monthly = r.filter(_.getAs[String]("grain") == "monthly")
    assert(daily.nonEmpty && monthly.nonEmpty)
    assert(daily.length == monthly.length)
    val dN = daily.head.getAs[Long]("n_partitions")
    val mN = monthly.head.getAs[Long]("n_partitions")
    assert(dN >= mN)
    r.foreach { row =>
      assert(row.getAs[Long]("rows_read") >= row.getAs[Long]("rows_hit"))
      assert(row.getAs[Long]("parts_touched") <=
        row.getAs[Long]("n_partitions"))
      assert(row.getAs[Long]("read_amp_e6") >= 1000000L)
    }
    // day-aligned probes read exactly what they need under the daily grain
    daily.foreach(row =>
      assert(row.getAs[Long]("read_amp_e6") == 1000000L))
    val byRid = monthly.map(x => x.getAs[Long]("rid") -> x).toMap
    daily.foreach { row =>
      val m = byRid(row.getAs[Long]("rid"))
      assert(row.getAs[Long]("rows_read") <= m.getAs[Long]("rows_read"))
    }
  }

  test("q562: clustering is what makes zone maps work") {
    val r = rows("q562_zone_map_skipping")
    assert(r.length == 2)
    val byL = r.map(x => x.getAs[String]("layout") -> x).toMap
    val nat = byL("a_natural")
    val clu = byL("b_date_clustered")
    // both layouts serve the same probes: identical true hit mass
    assert(nat.getAs[Long]("rows_hit") == clu.getAs[Long]("rows_hit"))
    r.foreach { row =>
      assert(row.getAs[Long]("rows_read") >= row.getAs[Long]("rows_hit"))
      assert(row.getAs[Long]("blocks_skipped") + row.getAs[Long]("blocks_read")
        == row.getAs[Long]("n_blocks") * 6)
    }
    // the clustered layout never reads more than the natural one, and
    // skips strictly more block-probe pairs
    assert(clu.getAs[Long]("rows_read") <= nat.getAs[Long]("rows_read"))
    assert(clu.getAs[Long]("false_read_e6") <=
      nat.getAs[Long]("false_read_e6"))
  }

  test("q540: clustered runs equal NDV — the stitch certificate") {
    val r = rows("q540_rle_ordering")
    assert(r.length == 3)
    val byOrd = r.map(x => x.getAs[String]("ordering") -> x).toMap
    // clustering on the flag itself collapses to one run per distinct value
    val ndv = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag").distinct().count()
    assert(byOrd("b_by_flag").getAs[Long]("runs") == ndv)
    r.foreach { row =>
      assert(row.getAs[Long]("runs") >= 1)
      assert(row.getAs[Long]("runs") <= row.getAs[Long]("n_rows"))
      assert(row.getAs[Long]("rle_bytes") == row.getAs[Long]("runs") * 3)
    }
  }
}
