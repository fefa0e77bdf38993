package graft.observability

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Runtime shuffle-skew monitor — the task-grain complement to
  * [[PlanLint.windowFunnels]] (reference: the sqlops monitoring scripts'
  * data-skew checks over distribution-incompatible joins; here measured
  * from real task metrics, not catalog heuristics). A plan can partition
  * "correctly" and still die at 100 TB when one key owns the stream — a
  * window keyed by a low-cardinality axis, a join on a hot key the AQE
  * skew rule didn't split (it only handles sort-merge sides), an
  * exploded-array hotspot. None of that is visible in plan SHAPE; it is
  * visible in the spread of shuffle-read rows across a stage's tasks.
  *
  * The listener accumulates per-stage max/total/count of task
  * shuffle-read records; [[drain]] snapshots-and-resets, reporting every
  * stage whose max task met `minRows` AND exceeded `ratio` × the mean of
  * the OTHER tasks (the plain mean includes the hot task itself, which
  * halves the measured ratio on narrow stages) — both conditions, so
  * tiny-but-lumpy report stages and big-but-even fact scans stay quiet.
  * Single-task stages are skipped: a
  * deliberate single-partition merge (TakeOrdered final, scalar rollup)
  * has no "spread", and corpus-sized single-task funnels are
  * [[PlanLint.windowFunnels]]'s rule.
  */
final class TaskSkewListener extends SparkListener {

  private final class Acc {
    var maxRows = 0L
    var totRows = 0L
    var maxBytes = 0L
    var nTasks = 0L
  }

  private val stages = new java.util.concurrent.ConcurrentHashMap[Int, Acc]()

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      val rows = m.shuffleReadMetrics.recordsRead
      val bytes = m.shuffleReadMetrics.totalBytesRead
      val acc = stages.computeIfAbsent(t.stageId, _ => new Acc)
      acc.synchronized {
        acc.nTasks += 1
        acc.totRows += rows
        if (rows > acc.maxRows) acc.maxRows = rows
        if (bytes > acc.maxBytes) acc.maxBytes = bytes
      }
    }
  }

  /** Snapshot skew findings and reset. Call after the listener bus has
    * drained (ListenerBridge.waitUntilEmpty) so task events attribute to
    * the action that ran them.
    *
    * `minBytes` separates hot keys from AQE coalescing artifacts: the
    * coalescer packs byte-SMALL map outputs into few tasks, so a
    * byte-tiny stage can show an extreme row ratio that means nothing at
    * scale (the first full-bench run flagged two unique-key stages whose
    * "skew" was 1 MB of coalesced longs), while a genuinely hot key is
    * the one thing coalescing can never split — it exceeds the advisory
    * partition size by construction. Pass 0 to disable the byte floor
    * (tests with synthetic byte-tiny fixtures).
    */
  def drain(minRows: Long, ratio: Double,
      minBytes: Long = 0L): Seq[PlanLint.Finding] = {
    val out = Seq.newBuilder[PlanLint.Finding]
    val it = stages.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      val a = e.getValue
      val (mx, tot, mxB, n) =
        a.synchronized((a.maxRows, a.totRows, a.maxBytes, a.nTasks))
      val restMean = math.max(1.0, (tot - mx).toDouble / math.max(1L, n - 1))
      if (n >= 2 && mx >= minRows && mxB >= minBytes &&
          mx.toDouble >= ratio * restMean)
        out += PlanLint.Finding("task-skew", "warn",
          s"stage ${e.getKey}: max task read $mx shuffle rows ($mxB bytes) " +
            s"vs ${restMean.toLong} mean across the other ${n - 1} tasks — " +
            "one key owns the stream; salt it, bucket it, or move the hot " +
            "group through the two-level device")
    }
    out.result()
  }
}
