package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("shingles preserve order and handle short docs") {
    val t = Text.shingles(split(lit("a b c d"), " "), 3)
    assert(eval(t) === Seq("a b c", "b c d"))
    val short = Text.shingles(split(lit("a b"), " "), 3)
    assert(eval(short) === Seq())
  }

  test("identical texts get identical minhash signatures; disjoint differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "entirely different words compose this sentence here now right")
    ).toDF("doc_id", "text")
    val sig = df.select($"doc_id",
      Text.minhashSignature(Text.shingleSet($"text", 3), 16).as("sig"))
    val rows = sig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
  }

  test("simhash: identical texts agree, similar texts are close") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", Text.simhash64(Text.tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(d13 > 0 && d13 <= 24, s"similar docs should be hamming-close, got $d13")
  }

  test("winnow fingerprint is deterministic and non-empty for long docs") {
    val c = Text.winnowFingerprint(split(lit("a b c d e f g h i j"), " "), 3, 4)
    val a = eval(c).asInstanceOf[scala.collection.Seq[Long]].toList
    val b = eval(c).asInstanceOf[scala.collection.Seq[Long]].toList
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("langId picks the language with most stopword hits") {
    assert(eval(Text.langId(split(lit("le chat est sur la table et il dort"), " "))) === "fr")
    assert(eval(Text.langId(split(lit("the cat is on it and that for"), " "))) === "en")
    assert(eval(Text.langId(split(lit("xyzzy qwerty plugh"), " "))) === "und")
  }

  test("tokenCount") {
    assert(eval(Text.tokenCount(lit("one two three"))) === 3)
  }

  test("q56's exploded simhash equals the per-row Text.simhash64") {
    val perRow = graft.Tables.documents(spark, sfDir).limit(20)
      .select($"doc_id", Text.simhash64(Text.tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = graft.Tables.documents(spark, sfDir).limit(20)
      .select($"doc_id", explode(Text.tokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val votes = toks.groupBy($"doc_id")
      .agg(
        sum(when($"h".bitwiseAND(shiftleft(lit(1L), 0)) =!= 0L, 1L)
          .otherwise(-1L)).as("b0"),
        (1 until 64).map(j =>
          sum(when($"h".bitwiseAND(shiftleft(lit(1L), j)) =!= 0L, 1L)
            .otherwise(-1L)).as(s"b$j")): _*)
    val exploded = votes.select($"doc_id",
      (0 until 64).map(j =>
        when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exploded === perRow)
  }
}
