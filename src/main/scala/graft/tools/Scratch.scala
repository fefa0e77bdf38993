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
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"))
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
      case "profile" :: names =>
        // Per-query cost breakdown: Catalyst phase times (planning tracker)
        // plus one row per stage — tasks, wall, summed executor run time,
        // shuffle read/write — so "slow" decomposes into plan/driver vs
        // single-task map stages vs real shuffle volume.
        names.foreach { n =>
          val (full, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(n))
            .getOrElse(sys.error(s"no query matching $n"))
          // warm run: JIT + codegen cache, matches the bench's min-of-2
          graft.Tuning.reset(spark)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          val stages = new java.util.concurrent.ConcurrentLinkedQueue[
            (Int, String, Int, Long, Long, Long, Long)]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val m = si.taskMetrics
              stages.add((si.stageId,
                si.name.split('\n').head.take(60), si.numTasks,
                si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
                m.executorRunTime,
                m.shuffleReadMetrics.totalBytesRead,
                m.shuffleWriteMetrics.bytesWritten)): Unit
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val tBuilt = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val tDone = System.nanoTime()
          org.apache.spark.graft.ListenerBridge
            .waitUntilEmpty(spark.sparkContext, 5000L): Unit
          spark.sparkContext.removeSparkListener(listener)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          println(s"===== $full =====")
          println(f"[profile] build ${(tBuilt - t0) / 1e9}%.3f s, " +
            f"execute ${(tDone - tBuilt) / 1e9}%.3f s (warm)")
          val ph = df.queryExecution.tracker.phases
          ph.foreach { case (p, t) =>
            println(f"[profile]   phase $p%-16s ${(t.endTimeMs - t.startTimeMs) / 1e3}%.3f s")
          }
          import scala.jdk.CollectionConverters._
          val ss = stages.asScala.toSeq.sortBy(_._1)
          println(f"[profile] ${ss.size} stages, " +
            f"${ss.map(_._4).sum / 1e3}%.3f s stage wall (overlaps ok)")
          ss.foreach { case (id, nm, nt, wall, run, sr, sw) =>
            println(f"[profile]   stage $id%4d $nt%4d tasks wall ${wall / 1e3}%6.3f" +
              f" run ${run / 1e3}%7.3f  sRead ${sr / 1e6}%7.1fMB sWrite ${sw / 1e6}%7.1fMB  $nm")
          }
        }
      case "dump" :: outDir :: suffix :: names =>
        // Write .explain("formatted") of each query to <outDir>/<name>_<suffix>.txt
        // (the round's plan-artifact contract: plans/r08/<q>_before.txt / _after.txt).
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { n =>
          val (full, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(n))
            .getOrElse(sys.error(s"no query matching $n"))
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${full}_$suffix.txt"), txt)
          println(s"[scratch] dumped $full ($suffix): " +
            s"${txt.linesIterator.count(_.contains("Exchange"))} Exchange lines")
        }
      case "time" :: names =>
        names.foreach { n =>
          val (full, fn) = graft.SparkEntry.queries
            .find(_._1.startsWith(n))
            .getOrElse(sys.error(s"no query matching $n"))
          for (rep <- 1 to 3) time(s"$full #$rep") {
            graft.Tuning.reset(spark)
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
        }
      case "gen10x" :: outDir :: Nil =>
        // Synthesize the 10x documents slice for the SCALE.md probe
        // (r7 verdict stretch item): 10 replicas of the sf documents,
        // replica 0 verbatim, replicas 1-9 with every token suffixed
        // "_r<k>" so replicas are token-DISJOINT — within-replica
        // near-dup structure is preserved, cross-replica shingles never
        // collide. This measures how the dedup/ANN machinery's shuffles,
        // windows and candidate generation scale with VOLUME; it does
        // not add cross-replica duplicate discovery (stated in SCALE.md).
        // doc_id offset 10M per replica keeps ids disjoint.
        import org.apache.spark.sql.functions._
        val d = graft.Tables.documents(spark, sfDir)
        val out = d
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            explode(expr("sequence(0, 9)")).as("r"))
          .select(
            (col("doc_id") + col("r") * 10000000L).as("doc_id"),
            when(col("r") === 0, col("text"))
              .otherwise(array_join(expr(
                "transform(split(text, ' '), x -> concat(x, '_r', r))"),
                " ")).as("text"),
            col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")))
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .repartition(8)
        out.write.mode("overwrite").parquet(outDir)
        println(s"[scratch] gen10x: wrote ${spark.read.parquet(outDir).count()} docs to $outDir")
      case _ =>
        println("usage: Scratch explain|time|profile|dump|gen10x ...")
    }
    spark.stop()
  }
}
