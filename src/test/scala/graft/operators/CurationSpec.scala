package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** End-to-end tests for the curation operators, on the driver corpus for
  * distribution invariants and on a handcrafted corpus (written as a real
  * documents.parquet so each Q runs its full path) for value-level edges.
  */
class CurationSpec extends SparkSpec {

  /** Write a synthetic documents table and return its directory. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q83 flags a looping document and keeps varied text") {
    val dir = corpus(Seq(
      (1L, ("spam ham " * 20).trim, "en", "s0"),              // one bigram everywhere
      (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "s0"))) // all distinct
    val out = CurationQueries.q83RepetitionMetrics(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("rep_band") === "reject")
    assert(out(2L).getAs[String]("rep_band") === "keep")
    assert(out(2L).getAs[Long]("dup_bigram_frac_e6") === 0L)
    // coverage of the dominant bigram approaches 100% on the loop
    assert(out(1L).getAs[Long]("top_bigram_frac_e6") > 900000L)
  }

  test("q169 language rollup reconciles with the per-document q135 totals") {
    val byLang = CurationQueries.q169VocabCoverage(spark, sfDir).collect()
    val docTotals = CurationQueries.q135BpeApply(spark, sfDir)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens")), sum(col("n_chars")))
      .collect()(0)
    assert(byLang.map(_.getAs[Long]("n_words")).sum === docTotals.getLong(0))
    assert(byLang.map(_.getAs[Long]("n_sym_total")).sum === docTotals.getLong(1))
    assert(byLang.map(_.getAs[Long]("n_char_total")).sum === docTotals.getLong(2))
    byLang.foreach { r =>
      assert(r.getAs[Long]("n_single") <= r.getAs[Long]("n_words"), r)
      // fertility ≥ 1 symbol per word by construction
      assert(r.getAs[Long]("fertility_e6") >= 1000000L, r)
    }
  }

  test("q84 removes exactly the corpus-repeated segments, order-preserved") {
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val aTail = (1 to 8).map(i => s"a$i").mkString(" ")
    val bTail = (1 to 8).map(i => s"b$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, s"$shared $aTail", "en", "s0"),
      (2L, s"$shared $bTail", "en", "s0"),
      (3L, "tiny doc", "en", "s0"))) // < 8 tokens: no segments at all
    val out = CurationQueries.q84SegmentDedup(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(3L))
    assert(out(1L).getAs[Long]("n_segs") === 2L)
    assert(out(1L).getAs[Long]("n_removed") === 1L)
    // the cleaned doc is exactly the unique tail
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L).getAs[String]("clean_hash") === md5hex(aTail))
    assert(out(2L).getAs[String]("clean_hash") === md5hex(bTail))
  }

  test("q85 contamination is the benchmark 3-gram overlap, zero rows kept") {
    val dir = corpus(Seq(
      (0L, "alpha beta gamma delta", "en", "s0"),        // benchmark (0 % 97 = 0)
      (1L, "alpha beta gamma other words here", "en", "s0"), // shares 'alpha beta gamma'
      (2L, "completely different tokens entirely now", "en", "s0")))
    val out = CurationQueries.q85Decontaminate(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(0L)) // benchmark rows are not in the training report
    assert(out(1L).getAs[String]("flag") === "contaminated")
    assert(out(1L).getAs[Long]("n_overlap") === 1L)
    assert(out(2L).getAs[String]("flag") === "clean")
    assert(out(2L).getAs[Long]("n_overlap") === 0L)
  }

  test("q86 upweights rare languages and the sample is hash-thresholded") {
    val d = graft.Tables.documents(spark, sfDir)
    val perLang = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = CurationQueries.q86TemperatureResample(spark, sfDir)
    val selLang = sel.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // overall take is about half the corpus
    val total = perLang.values.sum
    val taken = selLang.values.sum
    assert(taken > total / 3 && taken < 2 * total / 3)
    // sqrt temperature: the rarest language keeps a larger FRACTION than the
    // most common one
    val rare = perLang.minBy(_._2)._1
    val common = perLang.maxBy(_._2)._1
    val rareRate = selLang(rare).toDouble / perLang(rare)
    val commonRate = selLang(common).toDouble / perLang(common)
    assert(rareRate > commonRate,
      s"rare $rare rate $rareRate should exceed common $common rate $commonRate")
  }

  test("q87 packing conserves tokens and bins are contiguous from zero") {
    val bins = CurationQueries.q87SequencePacking(spark, sfDir)
    val d = graft.Tables.documents(spark, sfDir)
    val totTokens = d.select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(bins.agg(sum("bin_tokens")).collect()(0).getLong(0) === totTokens)
    // per lang: bin ids are exactly 0..max with no holes
    val byLang = bins.groupBy("lang")
      .agg(countDistinct("bin_id").as("n"), min("bin_id").as("lo"),
        max("bin_id").as("hi")).collect()
    byLang.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
    }
    // a bin never starts mid-capacity: every bin except the last holds at
    // least one document and fill accounting matches the sum
    assert(bins.filter(col("n_docs") < 1).count() === 0)
  }

  test("q94 redacts every synthesized contact field and nothing else") {
    val out = CurationQueries.q94PiiRedact(spark, sfDir)
    // the contact line carries exactly one email, one IP, one phone per row;
    // bare numbers = the name's id digits + the trailing ref
    assert(out.filter(col("n_email") =!= 1 || col("n_ip") =!= 1 ||
      col("n_phone") =!= 1 || col("n_num") =!= 2).count() === 0)
    // full redaction leaves no digit anywhere (placeholders are digit-free);
    // the shared contactLine is exactly the string the query masks
    val c = graft.Tables.customer(spark, sfDir)
    val redacted = c.select(
      graft.functions.Pii.redact(CurationQueries.contactLine).as("r"))
    assert(redacted.filter(col("r").rlike("[0-9]")).count() === 0)
  }

  test("q96 surprisal: nonnegative whole bits, bigram accounting exact") {
    val out = CurationQueries.q96BigramSurprisal(spark, sfDir)
    assert(out.filter(col("sum_bits") < 0).count() === 0)
    // n_bigrams per doc = token count − 1 (all test docs have ≥ 2 tokens)
    val d = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("exp_n"))
    assert(out.join(d, "doc_id")
      .filter(col("n_bigrams") =!= col("exp_n")).count() === 0)
    // a repeated (w1 w2) everywhere-bigram has surprisal 0; sanity: the mean
    // is strictly below the unigram entropy ceiling bitlen(total bigrams)
    val totBg = out.agg(sum("n_bigrams")).collect()(0).getLong(0)
    val ceil = 64 - java.lang.Long.numberOfLeadingZeros(totBg)
    assert(out.filter(col("mean_bits_e6") > ceil * 1000000L).count() === 0)
  }

  test("q100 funnel is monotone and consistent with its stage operators") {
    val rows = CurationQueries.q100CurationFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val d = graft.Tables.documents(spark, sfDir)
    assert(rows("0_raw")._1 === d.count())
    // docs and tokens shrink (weakly) at every gate
    val order = Seq("0_raw", "1_rep_gate", "2_exact_dedup", "3_decontam", "4_resample")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a)._1 >= rows(b)._1, s"$a -> $b docs must not grow")
      assert(rows(a)._2 >= rows(b)._2, s"$a -> $b tokens must not grow")
    }
    // packing conserves the resampled tokens; bins ≥ ceil(tokens / capacity)
    assert(rows("5_packed")._2 === rows("4_resample")._2)
    val minBins = (rows("4_resample")._2 + CurationQueries.PackCapacity - 1) /
      CurationQueries.PackCapacity
    assert(rows("5_packed")._1 >= minBins)
    // the rep gate matches q83's band column
    val q83Keep = CurationQueries.q83RepetitionMetrics(spark, sfDir)
      .filter(col("rep_band") === "keep").count()
    assert(rows("1_rep_gate")._1 === q83Keep)
  }

  test("q221 collocations: support floor holds and lift ordering is exact") {
    val rows = TextQueries.q221PmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach(r => assert(r.getAs[Long]("c_xy") >= 5L))
    // returned in strict (lift desc, w1, w2) order
    rows.sliding(2).foreach { case Array(a, b) =>
      val la = a.getAs[Long]("lift_e6"); val lb = b.getAs[Long]("lift_e6")
      assert(la > lb || (la == lb &&
        (a.getString(1) < b.getString(1) ||
          (a.getString(1) == b.getString(1) && a.getString(0) <= b.getString(0)))))
    case _ => ()
    }
  }

  test("q222 Heaps growth: prefix sums reconcile with corpus totals") {
    val rows = TextQueries.q222HeapsGrowth(spark, sfDir)
      .orderBy("bucket").collect()
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    val totalTokens = toks.count()
    val totalTypes = toks.distinct().count()
    assert(rows.last.getAs[Long]("cum_tokens") === totalTokens)
    assert(rows.last.getAs[Long]("cum_types") === totalTypes)
    // vocabulary growth is monotone and sub-linear vs tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("cum_types") >= a.getAs[Long]("cum_types"))
      assert(b.getAs[Long]("cum_tokens") > a.getAs[Long]("cum_tokens"))
    case _ => ()
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("cum_types") <= r.getAs[Long]("cum_tokens")))
  }

  test("q223 readability: bands partition the corpus, panel is integer-exact") {
    val rows = CurationQueries.q223Readability(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val lo = r.getAs[Long]("min_flesch_e3")
      val hi = r.getAs[Long]("max_flesch_e3")
      val mean = r.getAs[Long]("mean_flesch_e3")
      assert(lo <= hi)
      // floor-mean sits within [min-1, max]
      assert(mean >= lo - 1 && mean <= hi)
      val band = r.getAs[String]("band")
      if (band == "easy") assert(lo >= 60000L)
      if (band == "difficult") assert(hi < 30000L)
    }
  }
  test("q241 OOV: base source is exactly zero-OOV, rates within bounds") {
    val rows = CurationQueries.q241OovAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val base = rows(0).getAs[String]("base_source")
    rows.foreach { r =>
      assert(r.getAs[String]("base_source") === base)
      val tokRate = r.getAs[Long]("oov_token_rate_e6")
      val typRate = r.getAs[Long]("oov_type_rate_e6")
      assert(tokRate >= 0L && tokRate <= 1000000L)
      assert(typRate >= 0L && typRate <= 1000000L)
      assert(r.getAs[Long]("n_oov_tokens") <= r.getAs[Long]("n_tokens"))
      if (r.getAs[String]("source") == base) {
        assert(r.getAs[Long]("n_oov_tokens") === 0L)
        assert(r.getAs[Long]("n_oov_types") === 0L)
      }
    }
  }

  test("q242 shards: mass conserved, near-balanced, snake is deterministic") {
    val rows = CurationQueries.q242ShardPlanner(spark, sfDir).collect()
    assert(rows.length === 8)
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    val masses = rows.map(_.getAs[Long]("shard_tokens"))
    val total = masses.sum
    // snake on sorted input: every shard within 2% of the ideal share here
    rows.foreach { r =>
      val b = r.getAs[Long]("balance_e6")
      assert(b > 980000L && b < 1020000L, s"shard ${r.get(0)} balance $b")
    }
    assert(masses.max - masses.min <= total / 50,
      "max-min spread must stay a small fraction of the mass")
  }
}
