package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN quality: the banded-multiprobe LSH path (q61) must recover most of the
  * exact brute-force top-k (q60). The synthetic corpus is adversarial for
  * LSH — random 64-dim vectors put true top-5 neighbors at cosine ~0.3 — so
  * the measured recall (~0.8 at sf0.01, asserted ≥ 0.5 here at sf0.001)
  * documents the 4-band × Hamming≤2-multiprobe design honestly rather than
  * assuming near-dup-grade similarity.
  */
class SimilaritySpec extends SparkSpec {

  test("banded multiprobe LSH recalls most exact top-5 neighbors") {
    val exact = SimilarityQueries.q60KnnBrute(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val ann = SimilarityQueries.q61AnnLsh(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val total = exact.count()
    val hit = exact.join(ann, Seq("probe_id", "neighbor_id")).count()
    assert(total > 0)
    val recall = hit.toDouble / total
    assert(recall >= 0.5, s"recall $recall ($hit of $total)")
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = SimilarityQueries.q63CosineNearDup(spark, sfDir).collect()
    pairs.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("degenerate LSH bucket: pair fan-out is capped by construction") {
    // 50 identical-sign vectors all collide into ONE (band_idx, band_val)
    // bucket — the skew shape that made the r2 self-join unbounded at scale.
    import spark.implicits._
    val banded = (1L to 50L).map(id => (id, 0, 7L))
      .toDF("vec_id", "band_idx", "band_val")
    // cap below bucket size: the whole bucket is dropped, zero pairs emitted
    assert(SimilarityQueries.bandedPairs(banded, cap = 10).count() === 0L)
    // cap at/above bucket size: exactly m(m-1)/2 ordered pairs, vec_a < vec_b
    val pairs = SimilarityQueries.bandedPairs(banded, cap = 50)
    assert(pairs.count() === 50L * 49 / 2)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() === 0L)
  }

  test("IVF assignment survives k=1024 under forced codegen (no fallback)") {
    import spark.implicits._
    // a realistic coarse-quantizer size: the old literal formulation blew
    // past the codegen method limit here and fell back to interpreted
    val dim = 64
    val k = 1024
    def vec(seed: Int): Seq[Double] =
      (0 until dim).map(i => ((seed * 31 + i * 7) % 13 - 6).toDouble)
    val centroids = (0 until k).map(vec)
    val df = Seq(5, 99, 512, 1023).map(s => Tuple1(vec(s))).toDF("v")
    // CODEGEN_ONLY turns any compile fallback into a hard failure
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = df.select(Ivf.assignExpr(col("v"), centroids).as("c"),
        Ivf.probeExpr(col("v"), centroids, 4).as("probes")).collect()
      // argmin oracle computed independently in Scala
      def nearestOf(v: Seq[Double]): Int =
        centroids.zipWithIndex.minBy { case (c, j) =>
          (-2.0 * v.zip(c).map { case (a, b) => a * b }.sum +
            c.map(x => x * x).sum, j)
        }._2
      Seq(5, 99, 512, 1023).zip(got).foreach { case (s, r) =>
        assert(r.getInt(0) === nearestOf(vec(s)), s"seed $s")
        val probes = r.getSeq[Int](1)
        assert(probes.length === 4 && probes.head === r.getInt(0))
        assert(probes.distinct.length === 4)
      }
      // dimension mismatch stays NULL, not a partial answer
      val bad = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
        .select(Ivf.assignExpr(col("v"), centroids).as("c")).collect()(0)
      assert(bad.isNullAt(0))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("two-level IVF: 4096 lists, O(k1+k2) assignment, codegen-only") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val q = Ivf.trainTwoLevel(e, k1 = 64, k2 = 64, dim = 64, iters = 3)
    assert(q.lists === 4096)
    assert(q.coarse.size === 64 && q.fine.size === 4096)
    assert(q.fine.forall(_.size === 64))

    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val assigned = Ivf.assignTwoLevel(e, q)
        .select("vec_id", "cluster", "embedding").collect()
      assert(assigned.length === e.count())
      // hierarchical contract, checked against a driver-side recompute:
      // cluster = coarse argmin, then fine argmin within that cell's slice
      def argmin(v: Seq[Double], cents: Seq[Seq[Double]], base: Int): Int =
        cents.zipWithIndex.minBy { case (c, j) =>
          (-2.0 * v.zip(c).map(p => p._1 * p._2).sum + c.map(x => x * x).sum,
            j)
        }._2 + base
      assigned.take(50).foreach { r =>
        val v = r.getSeq[Float](2).map(_.toDouble)
        val cell = argmin(v, q.coarse, 0)
        val expect = argmin(v, q.fine.slice(cell * 64, cell * 64 + 64), cell * 64)
        assert(r.getInt(1) === expect, s"vec ${r.getLong(0)}")
      }
      // lists genuinely partition the space (many distinct lists in use)
      val used = assigned.map(_.getInt(1)).distinct.length
      assert(used > 64, s"only $used lists used")
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")

    // determinism: retraining yields the identical quantizer
    val q2 = Ivf.trainTwoLevel(e, k1 = 64, k2 = 64, dim = 64, iters = 3)
    assert(q2.coarse === q.coarse && q2.fine === q.fine)
  }

  test("IVF index: clusters partition the corpus; probe recall beats nprobe/k") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val centroids = Ivf.train(e, k = 16, dim = 64, iters = 5)
    assert(centroids.size === 16 && centroids.forall(_.size === 64))
    val assigned = Ivf.assign(e, centroids)
    assert(assigned.count() === e.count()) // every vector lands in a list
    assert(assigned.select("cluster").distinct().count() > 1)

    val exact = SimilarityQueries.q60KnnBrute(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val ivf = SimilarityQueries.q64AnnIvf(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val total = exact.count()
    val hit = exact.join(ivf, Seq("probe_id", "neighbor_id")).count()
    val recall = hit.toDouble / total
    // scanning nprobe/k = 1/4 of the corpus blindly would recall ~0.25;
    // the quantizer must do substantially better
    assert(recall >= 0.5, s"IVF recall $recall ($hit of $total)")
  }

  test("q177 separability matches a serial integer-centroid recompute") {
    val rows = SimilarityQueries.q177ClassSeparability(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r).toMap
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray
        .map(x => BigDecimal(x.toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val dim = vecs.head._2.length
    def trunc(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    val byLabel = vecs.groupBy(_._1)
    val gSum = Array.tabulate(dim)(d => vecs.map(_._2(d)).sum)
    val gC = gSum.map(trunc(_, vecs.length.toLong))
    for ((lbl, vs) <- byLabel) {
      val n = vs.length.toLong
      val c = Array.tabulate(dim)(d => trunc(vs.map(_._2(d)).sum, n))
      val w = vs.map(v => (0 until dim).map { d =>
        val e = v._2(d) - c(d); e * e
      }.sum).sum
      val cd = (0 until dim).map { d =>
        val e = c(d) - gC(d); e * e
      }.sum
      val r = rows(lbl)
      assert(r.getAs[Long]("n_vecs") === n, lbl)
      assert(r.getAs[Long]("msr_e8") === w / n, lbl)
      assert(r.getAs[Long]("cdist2_e8") === cd, lbl)
    }
    // classes sit measurably apart from the global centroid
    assert(rows.values.exists(_.getAs[Long]("cdist2_e8") > 0L))
  }

  test("cluster purity partitions the corpus and beats the base rate") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val n = e.count()
    val out = SimilarityQueries.q88ClusterPurity(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === n) // clusters partition
    out.foreach { r =>
      val purity = r.getAs[Long]("purity_e6")
      assert(purity > 0L && purity <= 1000000L)
      assert(r.getAs[Long]("majority_n") <= r.getAs[Long]("n_vecs"))
    }
    // weighted mean purity must beat the majority-class base rate — i.e.
    // the clusters actually carry label signal, they aren't random cuts
    val base = e.groupBy("label").count().collect().map(_.getLong(1)).max
    val majoritySum = out.map(_.getAs[Long]("majority_n")).sum
    assert(majoritySum > base,
      s"cluster-majority total $majoritySum should beat base rate $base")
  }

  test("q216 PQ distortion: nonnegative, one row per subquantizer, beats random") {
    val rows = SimilarityQueries.q216PqDistortion(spark, sfDir).collect()
      .map(r => r.getAs[Int]("m") -> r).toMap
    assert(rows.keySet === (0 until 8).toSet)
    val n = graft.Tables.embeddings(spark, sfDir).count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("total_dist_e6") >= 0L)
      assert(r.getAs[Long]("mean_dist_e6") ===
        r.getAs[Long]("total_dist_e6") / n)
    }
    // trained codewords must beat quantizing everything to the zero vector:
    // distortion < E||x_sub||^2 (the zero-codebook baseline)
    val zeroBaseline = graft.Tables.embeddings(spark, sfDir)
      .select(expr("""aggregate(slice(cast(embedding as array<double>), 1, 8),
        0d, (acc, x) -> acc + x * x)""").as("n2"))
      .agg(sum(expr("cast(round(n2 * 1000000) as bigint)"))).collect()(0).getLong(0)
    assert(rows(0).getAs[Long]("total_dist_e6") < zeroBaseline,
      "codebook must beat the zero-vector quantizer")
  }

  test("q194 MMR equals the serial greedy trace and diversifies the set") {
    val rows = SimilarityQueries.q194MmrDiversify(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length === SimilarityQueries.MmrK)
    // serial reference: same candidate cut, same greedy recurrence
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def sim(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val cand = vecs.keys.filter(_ != 0L).toSeq
      .map(id => id -> sim(id, 0L))
      .sortBy { case (id, s) => (-s, id) }.take(SimilarityQueries.MmrC)
    var picked = Vector(cand.head._1)
    var expectScores = Vector(0.7 * cand.head._2)
    while (picked.size < SimilarityQueries.MmrK) {
      val best = cand.filterNot(c => picked.contains(c._1)).map { case (id, s) =>
        val mx = picked.map(p => sim(id, p)).max
        (id, 0.7 * s - 0.3 * mx)
      }.sortBy { case (id, sc) => (-sc, id) }.head
      picked :+= best._1
      expectScores :+= best._2
    }
    assert(rows.map(_.getAs[Long]("vec_id")).toVector === picked)
    rows.zip(expectScores).foreach { case (r, sc) =>
      assert(r.getAs[Double]("mmr_score") === sc, r)
    }
    // diversification bites: the MMR set differs from plain top-k
    val topK = cand.take(SimilarityQueries.MmrK).map(_._1).toSet
    assert(picked.toSet !== topK,
      "on this corpus MMR should trade at least one nearest neighbor for coverage")
  }
  test("q227 PCA axis: unit norm, eigen residual small, dominates coordinates") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val dim = 64
    val model = Pca.train(e, dim)
    val v = model.wE6.map(_.toDouble / 1e6)
    val n2 = v.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 0.01, s"axis not unit: $n2")
    // exact covariance recomputed independently from the quantized rows
    val rows = e.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray.map(x => math.rint(x * 10000).toLong))
    val n = rows.length
    val sum = new Array[Long](dim)
    rows.foreach(r => (0 until dim).foreach(i => sum(i) += r(i)))
    val m = Array.fill(dim, dim)(BigInt(0))
    rows.foreach { r =>
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { m(i)(j) += BigInt(r(i)) * r(j); j += 1 }
        i += 1
      }
    }
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val mij = if (i <= j) m(i)(j) else m(j)(i)
      (BigInt(n) * mij - BigInt(sum(i)) * sum(j)).toDouble
    }
    val cv = c.map(row => row.indices.map(j => row(j) * v(j)).sum)
    val lambda = v.indices.map(i => v(i) * cv(i)).sum
    // residual ||Cv - lambda v|| relative to ||Cv||: converged iteration
    val res = math.sqrt(cv.indices.map(i => {
      val d = cv(i) - lambda * v(i); d * d
    }).sum) / math.sqrt(cv.map(x => x * x).sum)
    assert(res < 0.05, s"power iteration residual $res")
    // variance along the axis dominates every coordinate axis (v^T C v >= C_ii)
    assert(c.indices.forall(i => lambda >= c(i)(i) - 1e-6),
      "principal axis variance must dominate per-coordinate variances")
    // the gate query projects with this exact axis
    val top = SimilarityQueries.q227PcaProjection(spark, sfDir).collect()
    assert(top.length <= 25 && top.nonEmpty)
    val scores = top.map(_.getAs[Long]("score_e10"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
  test("q229 JL harness: sparse matrix shape and refine beats raw projection") {
    val m = graft.functions.Vectors.sparseSignMatrix(64, 16)
    assert(m.length === 16 && m.forall(_.length === 64))
    val flat = m.flatten
    assert(flat.forall(v => v == -1L || v == 0L || v == 1L))
    // Achlioptas density: about 1/3 nonzero (loose band for 1024 draws)
    val nz = flat.count(_ != 0L)
    assert(nz > 1024 / 5 && nz < 1024 / 2, s"nonzero density off: $nz/1024")
    val rows = SimilarityQueries.q229RpRecall(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 5L)
      assert(r.getAs[Long]("recall_e6") === h * 1000000L / 5L)
    }
  }
}
