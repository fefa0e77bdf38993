package graft.maintenance

import java.time.LocalTime

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class AutoscalerSpec extends SparkSpec {
  import Autoscaler._

  test("ladder navigation clamps at the ends and rejects unknown levels") {
    val l = ReferenceLadder
    assert(l.upLevel("DW500") === "DW600")
    assert(l.upLevel("DW600") === "DW1000") // the reference ladder's jump
    assert(l.upLevel("DW6000") === "DW6000") // clamped at max
    assert(l.downLevel("DW100") === "DW100") // clamped at min
    assert(l.downLevel("DW500") === "DW400")
    assert(l.compare("DW100", "DW6000") === -1)
    assert(l.compare("DW500", "DW500") === 0)
    intercept[IllegalArgumentException] { l.upLevel("DW9999") }
  }

  test("alerts step one level, Activated-only, window-guarded downscale") {
    val a = new Autoscaler("dw1")
    assert(a.currentLevel === "DW500")
    // Resolved alerts are ignored
    assert(a.onAlert("cpu scale up", "Resolved") === "DW500")
    assert(a.onAlert("cpu Scale Up alert", "Activated") === "DW600")
    assert(a.onAlert("queue scale down", "Activated") === "DW500")

    // inside the scheduled scale-up window the downscale is refused
    val guarded = new Autoscaler("dw2",
      scaleUpWindow = Some((LocalTime.of(8, 0), LocalTime.of(18, 0))))
    assert(guarded.onAlert("scale down", "Activated",
      now = LocalTime.of(12, 0)) === "DW500")
    assert(guarded.onAlert("scale down", "Activated",
      now = LocalTime.of(20, 0)) === "DW400")
    val logs = guarded.scaleLogs(spark).collect()
    assert(logs.length === 2)
    assert(logs(0).getAs[String]("action") === "Refused")
    assert(logs(0).getAs[String]("error") != null)
    assert(logs(1).getAs[String]("action") === "Scale Down")
    assert(logs(1).getAs[String]("dwu_before") === "DW500")
    assert(logs(1).getAs[String]("dwu_after") === "DW400")
  }

  test("timer restores the default only from below") {
    val a = new Autoscaler("dw3")
    a.onAlert("scale down", "Activated")
    a.onAlert("scale down", "Activated")
    assert(a.currentLevel === "DW300")
    assert(a.onTimer() === "DW500") // below default -> restored
    a.onAlert("scale up", "Activated")
    assert(a.onTimer() === "DW600") // above default -> untouched
    val timerLogs = a.scaleLogs(spark)
      .filter(col("alert_name") === "timer").collect()
    assert(timerLogs.length === 1)
    assert(timerLogs(0).getAs[String]("action") === "Scale Up To Default")
  }

  test("suspend → resume round-trip preserves permanent tables and policies") {
    import graft.catalog.{Distribution, TablePolicy}
    import graft.sources.Ctas
    val lc = new Lifecycle("dw6", () => spark.newSession(),
      Some(new Autoscaler("dw6")))
    assert(lc.state === Lifecycle.Paused)
    intercept[IllegalStateException] { lc.session }
    val s1 = lc.resume() // provision
    assert(lc.state === Lifecycle.Online)
    s1.sql("DROP TABLE IF EXISTS lifecycle_rt")
    Ctas.create(s1, s1.range(100).toDF("id"), "lifecycle_rt",
      TablePolicy(Distribution.Hash("id", 4)))
    s1.range(5).toDF("id").createOrReplaceTempView("lifecycle_scratch")
    assert(s1.catalog.tableExists("lifecycle_scratch"))

    lc.suspend()
    assert(lc.state === Lifecycle.Paused)
    intercept[IllegalStateException] { lc.session } // paused refuses logins

    val s2 = lc.resume()
    // durable catalog survived the pause: the table, its rows, its policy
    assert(s2.catalog.tableExists("lifecycle_rt"))
    assert(s2.table("lifecycle_rt").count() === 100)
    assert(TablePolicy.of(s2, "lifecycle_rt").distribution ===
      Distribution.Hash("id", 4))
    // session-scoped temp state dies with the pause (reference #temp
    // tables die when pause kills sessions)
    assert(!s2.catalog.tableExists("lifecycle_scratch"))
    // compute posture rebuilt: engine function surface is re-registered
    assert(s2.sql("SELECT QUOTENAME('x') AS q").collect()(0)
      .getString(0) === "[x]")

    // idempotent no-ops, all journalled
    lc.resume()
    lc.suspend()
    lc.suspend()
    val j = lc.journal(spark).collect()
    assert(j.map(_.getAs[String]("action")).toSeq ===
      Seq("Resume", "Pause", "Resume", "Resume", "Pause", "Pause"))
    assert(j(3).getAs[String]("detail") === "already online")
    assert(j(5).getAs[String]("detail") === "already paused")
    s2.sql("DROP TABLE IF EXISTS lifecycle_rt")
  }

  test("lifecycle actions run as orchestrator activities (ADF ActionType)") {
    val lc = new Lifecycle("dw7", () => spark.newSession())
    lc.resume()
    // maintenance window pipeline: pause → (external work) → resume,
    // wired by dataset dependencies exactly like the ADF sample
    val pause = Lifecycle.activity(lc, Lifecycle.ActionPause,
      outputs = Set("ds_paused"))
    val work = Orchestrator.Activity("offline-maintenance",
      Set("ds_paused"), Set("ds_maintained")) { _ =>
      assert(lc.state === Lifecycle.Paused)
    }
    val resume = Lifecycle.activity(lc, Lifecycle.ActionResume,
      inputs = Set("ds_maintained"))
    val r = Orchestrator.run(spark, "maintenance-window",
      Seq(pause, work, resume))
    assert(r.succeeded)
    assert(lc.state === Lifecycle.Online)
    intercept[IllegalArgumentException] {
      Lifecycle.activity(lc, "Shrink").run(spark)
    }
  }

  test("applyTo scales shuffle parallelism linearly with the level") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val scaled = new Autoscaler("dw4")
      val cores = spark.sparkContext.defaultParallelism
      assert(scaled.applyTo(spark) === cores * 5) // DW500
      scaled.onAlert("scale up", "Activated")
      assert(scaled.applyTo(spark) === cores * 6) // DW600
      // at the ladder floor parallelism never drops below the cores
      val floor = new Autoscaler("dw5")
      (1 to 11).foreach(_ => floor.onAlert("scale down", "Activated"))
      assert(floor.currentLevel === "DW100")
      assert(floor.applyTo(spark) === cores)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
