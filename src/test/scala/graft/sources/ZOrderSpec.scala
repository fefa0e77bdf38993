package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ZOrderSpec extends SparkSpec {

  test("interleave places bit b of column i at position b*n + i") {
    import spark.implicits._
    // x=1 (bits 01), y=2 (bits 10) -> z: pos0=x0=1, pos1=y0=0, pos2=x1=0,
    // pos3=y1=1 -> 0b1001 = 9
    val z = Seq((1L, 2L)).toDF("x", "y")
      .select(ZOrderLayout.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .collect()(0).getLong(0)
    assert(z === 9L)
    // identity on one column
    val one = Seq((5L, 0L)).toDF("x", "y")
      .select(ZOrderLayout.interleave(Seq(col("x")), 8).as("z"))
      .collect()(0).getLong(0)
    assert(one === 5L)
  }

  test("quantize is monotone, clamped, and constant-safe") {
    import spark.implicits._
    val out = Seq(0.0, 50.0, 100.0, 150.0, -10.0).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), lit(0.0), lit(100.0), 8).as("q"))
      .collect().map(_.getLong(0))
    assert(out(0) === 0L)
    assert(out(1) === 127L)  // floor(0.5 * 255)
    assert(out(2) === 255L)
    assert(out(3) === 255L)  // clamped above
    assert(out(4) === 0L)    // clamped below
    val const = Seq(7.0).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), lit(7.0), lit(7.0), 8).as("q"))
      .collect()(0).getLong(0)
    assert(const === 0L)
  }

  /** Row-group [min,max] envelopes for one column across a parquet dir. */
  private def envelopes(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    files.flatMap { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val st = b.getColumns.asScala
          .find(_.getPath.toDotString == column).get.getStatistics
        (st.genericGetMin.asInstanceOf[Number].longValue(),
          st.genericGetMax.asInstanceOf[Number].longValue())
      } finally r.close()
    }
  }

  test("z-order layout prunes rowgroups on the non-leading dimension") {
    val l = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_shipdate"),
        col("l_quantity"))
    val base = Files.createTempDirectory("graft_zorder").toString

    // linear layout: sorted by ship date only (the classic time-sorted fact)
    l.repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$base/linear")
    // z-order on (shipdate, partkey)
    ZOrderLayout.cluster(l, Seq("l_shipdate", "l_partkey"), numFiles = 8)
      .write.mode("overwrite").parquet(s"$base/zorder")

    // both layouts hold identical data
    val a = spark.read.parquet(s"$base/linear")
    val b = spark.read.parquet(s"$base/zorder")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0)

    // a part-key box covering ~10% of the key range
    val (kLo, kHi) = {
      val r = l.agg(min("l_partkey"), max("l_partkey")).collect()(0)
      val lo = r.getLong(0); val hi = r.getLong(1)
      (lo, lo + (hi - lo) / 10)
    }
    def overlapping(dir: String): Int =
      envelopes(dir, "l_partkey").count { case (lo, hi) =>
        hi >= kLo && lo <= kHi }
    val linHit = overlapping(s"$base/linear")
    val zHit = overlapping(s"$base/zorder")
    val linTotal = envelopes(s"$base/linear", "l_partkey").size
    // time-sorted layout cannot prune on part key: every group overlaps
    assert(linHit === linTotal)
    // the z-layout must exclude at least half the rowgroups
    assert(zHit * 2 <= linHit,
      s"z-order still hits $zHit of $linHit rowgroups for a 10% key box")
  }
}
