package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Timing forces full materialization through the `noop` sink (a plain
  * count() would let Catalyst prune projections in map-only queries and
  * under-report). Session config mirrors the 100 TB posture: AQE on,
  * shuffle partitions sized to cores, broadcast threshold default.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for it.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Gate queries plus the production-hash fingerprint twins: the *_prod
    // numbers document what the md5 oracle portability costs at scale.
    val allBench = SparkEntry.queries ++ operators.TextQueries.productionQueries ++
      operators.EventQueries.productionQueries
    // Iteration knobs (unset in driver runs): ONLY=substring filter,
    // REPS=run each query n times (reports each rep, so warm-vs-cold plan
    // and codegen costs are visible).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val benchSet = only.fold(allBench)(f => allBench.filter(_._1.contains(f)))
    val results = benchSet.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val label = if (reps == 1) name else s"$name#$rep"
        val elapsed = (System.nanoTime() - t0) / 1e9
        // drop any blocks the query pinned (localCheckpoint registers as a
        // persistent RDD) so later queries never pay for earlier ones' state
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        label -> elapsed
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout under sbt is noisy ([info] prefixes, log4j) — the file is the
    // machine-readable channel (BENCH_r01 recorded "parsed": null).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
