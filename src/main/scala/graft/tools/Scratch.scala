package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling / plan-audit scratchpad (not part of the library
  * surface). Usage: runMain graft.tools.Scratch [explain q76 q80 ...]
  */
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
    args.toList match {
      case "explain" :: names =>
        names.foreach { n =>
          val (full, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(n))
            .getOrElse(sys.error(s"no query matching $n"))
          println(s"===== $full =====")
          val df = fn(spark, sfDir)
          println(df.queryExecution.executedPlan.toString.take(8000))
          val shuffles = df.queryExecution.executedPlan.toString
            .linesIterator.count(_.contains("Exchange"))
          println(s"[scratch] $full: $shuffles Exchange lines")
        }
      case "time" :: names =>
        names.foreach { n =>
          val (full, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(n))
            .getOrElse(sys.error(s"no query matching $n"))
          for (rep <- 1 to 3) time(s"$full #$rep") {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
        }
      case _ =>
        println("usage: Scratch explain|time <query-prefix>...")
    }
    spark.stop()
  }
}
