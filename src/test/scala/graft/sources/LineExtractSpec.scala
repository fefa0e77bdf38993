package graft.sources

import graft.SparkSpec

/** S9 diagnostic line extractor (reference:
  * samples/utility/Extract/extract/Program.cs:19-92): N lines at an offset
  * with 1-based numbering, matching the C# utility's contract.
  */
class LineExtractSpec extends SparkSpec {

  private lazy val file = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lx")
    val f = dir.resolve("big.txt")
    val lines = (1 to 1000).map(i => s"row-$i payload")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  test("extracts count lines starting at offset, 1-based numbering") {
    val got = LineExtract.lines(spark, file, offset = 499, count = 3)
      .orderBy("line_number").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(500L, 501L, 502L))
    assert(got.map(_.getString(1)).toSeq ===
      Seq("row-500 payload", "row-501 payload", "row-502 payload"))
  }

  test("offset 0 returns the head; past-EOF offset returns empty") {
    val head = LineExtract.lines(spark, file, offset = 0, count = 2).collect()
    assert(head.map(_.getString(1)).sorted.toSeq ===
      Seq("row-1 payload", "row-2 payload"))
    assert(LineExtract.lines(spark, file, offset = 5000, count = 10).count() === 0)
  }

  test("count clips at end of file") {
    val tail = LineExtract.lines(spark, file, offset = 998, count = 10).collect()
    assert(tail.length === 2)
    assert(tail.map(_.getString(1)).sorted.toSeq ===
      Seq("row-1000 payload", "row-999 payload"))
  }
}
