package graft

import graft.functions.{TSql, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5): T-SQL function algebra, window
  * identities, shingle/minhash behavior — checked over ScalaCheck-generated
  * inputs (sampled directly; the scalatest bridge artifact isn't on the
  * offline classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def evalOne(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  private def forAll[T](g: Gen[T], n: Int = 20)(f: T => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(v) => v }.take(n).foreach(f)
  }

  test("cents round-trips every 2-decimal money value exactly") {
    // the oracle-parity primitive: for any value representable with 2
    // decimals, round(v*100) must recover the integer cents exactly —
    // including negatives and values whose double repr sits below the true
    // decimal (e.g. 0.29 -> 28.999999999999996 * 100)
    forAll(Gen.choose(-200000000000L, 200000000000L), n = 200) { c =>
      val v = c / 100.0
      assert(evalOne(TSql.cents(lit(v))) === c, s"v=$v")
    }
  }

  test("QUOTENAME round-trip: unquoting recovers the identifier") {
    forAll(Gen.alphaNumStr.suchThat(_.length <= 20)) { s0 =>
      val s = s0 + "]x]"
      val quoted = evalOne(TSql.quotename(lit(s))).asInstanceOf[String]
      assert(quoted.head == '[' && quoted.last == ']')
      val inner = quoted.substring(1, quoted.length - 1).replace("]]", "]")
      assert(inner === s)
    }
  }

  test("DATEADD(day) then DATEDIFF(day) is the identity for whole days") {
    forAll(Gen.choose(-2000, 2000)) { n =>
      val base = lit("2020-06-15 00:00:00").cast("timestamp")
      val got = evalOne(TSql.datediff("day", base, TSql.dateadd("day", n, base)))
      assert(got === n.toLong)
    }
  }

  test("LEN(s + trailing spaces) == LEN(s)") {
    forAll(Gen.zip(Gen.alphaStr.suchThat(_.length <= 30), Gen.choose(0, 5))) { case (s, pad) =>
      val l1 = evalOne(TSql.len(lit(s)))
      val l2 = evalOne(TSql.len(lit(s + " " * pad)))
      assert(l1 === l2)
    }
  }

  test("shingle count equals max(tokens - n + 1, 0)") {
    forAll(Gen.zip(Gen.choose(0, 12), Gen.choose(2, 4))) { case (nTok, n) =>
      val text = (1 to nTok).map(i => s"w$i").mkString(" ")
      if (nTok > 0) {
        val c = evalOne(size(Text.shingles(split(lit(text), " "), n)))
        assert(c === math.max(nTok - n + 1, 0))
      }
    }
  }

  test("running window sum over the whole partition equals the group sum") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0, 3), Gen.choose(-100, 100))), 5) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.zipWithIndex
          .map { case ((k, v), i) => (k, i, v.toLong) }.toDF("k", "i", "v")
        val last = df.withColumn("run", sum($"v").over(w))
          .groupBy($"k").agg(max(struct($"i", $"run")).as("m"))
          .select($"k", $"m.run".as("final_run"))
        val direct = df.groupBy($"k").agg(sum($"v").as("total"))
        val joined = last.join(direct, "k")
          .filter($"final_run" =!= $"total")
        assert(joined.count() === 0)
      }
    }
  }

  test("moneyString renders any cents value losslessly with one sign") {
    forAll(Gen.choose(-200000000000L, 200000000000L), n = 200) { c =>
      val s = evalOne(TSql.moneyString(lit(c))).asInstanceOf[String]
      // grammar: optional '-', digits, '.', exactly two digits
      assert(s.matches("-?\\d+\\.\\d{2}"), s)
      // lossless: parse back to the original cents
      val neg = s.startsWith("-")
      val Array(whole, frac) = s.stripPrefix("-").split("\\.")
      val back = (whole.toLong * 100 + frac.toLong) * (if (neg) -1 else 1)
      assert(back === c, s"c=$c s=$s")
    }
  }

  test("banded pair generation: fan-out is m(m-1)/2 under the cap, 0 above") {
    import graft.operators.SimilarityQueries
    forAll(Gen.zip(Gen.choose(0, 40), Gen.choose(1, 30)), n = 15) {
      case (m, cap) =>
        val banded = (1L to m.toLong).map(id => (id, 0, 7L))
          .toDF("vec_id", "band_idx", "band_val")
        val got = SimilarityQueries.bandedPairs(banded, cap).count()
        val expect = if (m >= 2 && m <= cap) m.toLong * (m - 1) / 2 else 0L
        assert(got === expect, s"m=$m cap=$cap")
    }
  }

  test("identical shingle sets give identical minhash; estimate bounded by [0,1]") {
    forAll(Gen.listOfN(8, Gen.identifier.suchThat(_.nonEmpty)), 10) { words =>
      if (words.size >= 4) {
        val t = words.mkString(" ")
        val sig1 = evalOne(Text.minhashSignature(Text.shingleSet(lit(t), 2), 8))
        val sig2 = evalOne(Text.minhashSignature(Text.shingleSet(lit(t), 2), 8))
        assert(sig1 === sig2)
      }
    }
  }
}
