package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.functions.Text

/** Local profiling scratchpad (not part of the library surface). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = Tables.documents(spark, sfDir)
    noop(d) // warm scan

    for (rep <- 1 to 3) {
      val sh = d.select(col("doc_id"),
          explode(Text.shingleSet(col("text"), 3)).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("sh_hash"))
      time(s"explode+hash #$rep") { noop(sh) }
      val grouped = sh.groupBy(col("sh_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")).between(2, 1000))
      time(s"grouped #$rep") { noop(grouped) }
      val pairs = grouped
        .select(explode(flatten(transform(col("docs"), (x, i) =>
          transform(slice(col("docs"), i + lit(2), size(col("docs"))),
            y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      time(s"pairs #$rep") { noop(pairs) }
      val inter = pairs.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      time(s"inter #$rep") { noop(inter) }
      time(s"full q54 #$rep") {
        noop(graft.operators.TextQueries.q54NgramJaccard(spark, sfDir))
      }
    }
    spark.stop()
  }
}
