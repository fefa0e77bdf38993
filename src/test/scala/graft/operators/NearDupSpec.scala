package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Cluster resolution: min-label propagation must agree with a driver-side
  * union-find on arbitrary pair sets, converge within the diameter bound,
  * and refuse to return a half-converged labelling.
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("components match union-find on chains, stars, cycles and bridges") {
    val pairs: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),             // chain
      (10L, 11L), (10L, 12L), (10L, 13L),       // star
      (20L, 21L), (21L, 22L), (22L, 20L),       // cycle
      (4L, 10L),                                // bridge: chain ∪ star
      (30L, 31L))                               // separate pair
    val got = NearDup.clusters(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(pairs))
    // the merged chain+star component resolves to the global minimum
    assert(got(13L) === 1L && got(4L) === 1L)
  }

  test("random graphs: propagation equals union-find") {
    val gen = Gen.listOfN(25,
      Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 20L)))
      .suchThat(_.forall(p => p._1 != p._2))
    val seed0 = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed0)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s))
      .collect { case Some(ps) => ps }.take(5).foreach { ps =>
        val pairs = ps.filter(p => p._1 != p._2)
        val got = NearDup.clusters(pairs.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === unionFind(pairs), pairs)
      }
  }

  test("non-convergence within maxIters raises instead of mislabelling") {
    // a 12-node chain needs ~11 rounds; cap at 3 must fail loudly
    val chain = (1L to 11L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      NearDup.clusters(chain.toDF("a", "b"), maxIters = 3)
    }
  }

  test("star contraction matches union-find on mixed topologies") {
    val pairs: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 20L),
      (4L, 10L),
      (30L, 31L),
      (7L, 7L)) // self-loop must be ignored, 7 dropped as a singleton edge
    val got = NearDup.clustersStar(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(pairs.filter(p => p._1 != p._2)))
  }

  test("star contraction converges on a long chain in logarithmic rounds") {
    // a 200-node path has diameter 199: propagation at the default 16-round
    // cap must refuse, star contraction must finish well under its cap
    val chain = (1L to 199L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      NearDup.clusters(chain.toDF("a", "b"))
    }
    val got = NearDup.clustersStar(chain.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 200 && got.values.forall(_ === 1L))
  }

  test("random graphs: star contraction equals union-find") {
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.choose(1L, 25L), Gen.choose(1L, 25L)))
    val seed0 = org.scalacheck.rng.Seed(21L)
    Iterator.iterate(seed0)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s))
      .collect { case Some(ps) => ps }.take(5).foreach { ps =>
        val pairs = ps.filter(p => p._1 != p._2)
        val got = NearDup.clustersStar(pairs.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === unionFind(pairs), pairs)
      }
  }
}
