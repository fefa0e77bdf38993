package graft.maintenance

import java.time.LocalTime

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Service-objective autoscaling — the engine-side model of the reference's
  * SqlDwAutoScaler Azure Function (reference:
  * arm-templates/sqlDwAutoScaler/SqlDwAutoScaler/Shared/DwuConfigManager.cs:26-58,
  * ScaleSqlDw/ScaleSqlDw.cs:44-120, ScaleSqlDwByTimer/ScaleSqlDwByTimer.cs:30-60):
  *
  *  - a configured ladder of scale levels with a default
  *    (dwuconfigs.json: DW100..DW6000, default DW500),
  *  - alert-driven single-step moves: "scale up"/"scale down" alerts move
  *    exactly one ladder level, clamped at the ends, and only when the
  *    alert status is Activated (Resolved alerts are ignored),
  *  - scale-down refusal inside the scheduled scale-up window
  *    (IsInsideScaleUpScheduleTime — inclusive bounds, same-day window),
  *  - a timer that restores the default level whenever the current level
  *    has drifted BELOW it (never scales down),
  *  - an append-only scale log (the DwScaleLogs table) surfaced as a
  *    DataFrame.
  *
  * The cluster-infrastructure half (actually adding executors) is out of a
  * library's hands; `applyTo` maps the level onto the session knob the
  * level governs in Spark terms — shuffle parallelism proportional to DWU
  * units — so a scale decision has a real engine effect locally, and a real
  * deployment would hook the same callback to its cluster manager.
  */
object Autoscaler {

  /** Scale ladder + default, the dwuconfigs.json shape. */
  final case class Ladder(levels: Seq[String], default: String) {
    require(levels.nonEmpty && levels.contains(default),
      "default must be one of the ladder levels")
    private def indexOf(dwu: String): Int = {
      val i = levels.indexOf(dwu)
      require(i >= 0, s"Unsupported DWU was given: $dwu")
      i
    }
    /** One level up, clamped at max (DwuConfigManager.GetUpLevelDwu). */
    def upLevel(dwu: String): String =
      levels(math.min(indexOf(dwu) + 1, levels.size - 1))
    /** One level down, clamped at min (GetDownLevelDwu). */
    def downLevel(dwu: String): String =
      levels(math.max(indexOf(dwu) - 1, 0))
    /** Ladder-position compare (CompareDwus): -1/0/1. */
    def compare(a: String, b: String): Int =
      Integer.compare(indexOf(a), indexOf(b))
  }

  /** The reference ladder (dwuconfigs.json:2-16). */
  val ReferenceLadder: Ladder = Ladder(
    Seq("DW100", "DW200", "DW300", "DW400", "DW500", "DW600",
      "DW1000", "DW1200", "DW1500", "DW2000", "DW3000", "DW6000"),
    default = "DW500")

  final case class ScaleLog(dw_name: String, alert_name: String,
      action: String, dwu_before: String, dwu_after: String, error: String)
}

final class Autoscaler(dwName: String,
    ladder: Autoscaler.Ladder = Autoscaler.ReferenceLadder,
    scaleUpWindow: Option[(LocalTime, LocalTime)] = None,
    onScale: String => Unit = _ => ()) {
  import Autoscaler._

  private var current: String = ladder.default
  private val logs = ArrayBuffer.empty[ScaleLog]

  def currentLevel: String = current

  private def insideScaleUpWindow(now: LocalTime): Boolean =
    scaleUpWindow.exists { case (start, end) =>
      !now.isBefore(start) && !now.isAfter(end) // inclusive, like the C#
    }

  /** Alert entry point (ScaleSqlDw.Run): reacts only to Activated alerts;
    * the alert NAME carries the direction, matched case-insensitively.
    * Returns the level after the call.
    */
  def onAlert(alertName: String, status: String,
      now: LocalTime = LocalTime.NOON): String = {
    if (status != "Activated") return current
    val lower = alertName.toLowerCase
    val before = current
    if (lower.contains("scale up")) {
      val up = ladder.upLevel(before)
      val action = if (up != before) "Scale Up" else "At max"
      if (up != before) { current = up; onScale(up) }
      logs += ScaleLog(dwName, alertName, action, before, up, null)
    } else if (lower.contains("scale down")) {
      if (insideScaleUpWindow(now)) {
        logs += ScaleLog(dwName, alertName, "Refused", before, before,
          "Can't scale down. It's inside scheduled scale up hours")
      } else {
        val down = ladder.downLevel(before)
        val action = if (down != before) "Scale Down" else "At min"
        if (down != before) { current = down; onScale(down) }
        logs += ScaleLog(dwName, alertName, action, before, down, null)
      }
    }
    current
  }

  /** Timer entry point (ScaleSqlDwByTimer.Run): restore the default level
    * when the current level drifted below it; never scales down.
    */
  def onTimer(): String = {
    if (ladder.compare(current, ladder.default) < 0) {
      val before = current
      current = ladder.default
      onScale(current)
      logs += ScaleLog(dwName, "timer", "Scale Up To Default", before,
        current, null)
    }
    current
  }

  /** The DwScaleLogs table as a DataFrame. */
  def scaleLogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    logs.toSeq.toDF()
  }

  /** Map the level onto the session's parallelism knob: shuffle partitions
    * proportional to DWU units (DW100 → cores, linear above — mirroring the
    * whitepaper's "linear improvements with DWU" claim, whitepaper.md:17).
    */
  def applyTo(spark: SparkSession): Int = {
    val units = current.stripPrefix("DW").toInt
    val cores = spark.sparkContext.defaultParallelism
    val parts = math.max(cores, cores * units / 100)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    parts
  }
}
