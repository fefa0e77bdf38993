package graft.maintenance

import graft.SparkSpec
import Orchestrator._

/** ADF-shaped pipeline orchestration: dataset-dependency scheduling, the
  * retry ladder, failure skip-propagation, and publish-time validation.
  */
class OrchestratorSpec extends SparkSpec {

  private def act(name: String, in: Set[String], out: Set[String],
      policy: Policy = Policy())(body: => Unit): Activity =
    Activity(name, in, out, policy)(_ => body)

  test("diamond DAG runs every activity once, in dependency order") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val acts = Seq(
      act("load", Set("raw"), Set("staged")) { order.add("load") },
      act("dim", Set("staged"), Set("dim_t")) { order.add("dim") },
      act("fact", Set("staged"), Set("fact_t")) { order.add("fact") },
      act("report", Set("dim_t", "fact_t"), Set("out")) { order.add("report") })
    val res = Orchestrator.run(spark, "diamond", acts)
    assert(res.succeeded)
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.size === 4)
    assert(seq.head === "load" && seq.last === "report")
    assert(res.runs.map(_.status).forall(_ == "Succeeded"))
  }

  test("retry ladder: flaky activity succeeds on the long-retry attempt") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = act("flaky", Set("raw"), Set("out"),
      Policy(retry = 1, longRetry = 1)) {
      if (calls.incrementAndGet() < 3) sys.error(s"boom ${calls.get}")
    }
    val res = Orchestrator.run(spark, "retries", Seq(flaky))
    assert(res.succeeded)
    val rs = res.runs
    assert(rs.map(_.attempt) === Seq(1, 2, 3))
    assert(rs.map(_.status) === Seq("Failed", "Failed", "Succeeded"))
    assert(rs.head.error.startsWith("boom"))
  }

  test("permanent failure skips transitive dependents, independent branch runs") {
    val ran = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val acts = Seq(
      act("bad", Set("raw"), Set("a")) { sys.error("dead") },
      act("mid", Set("a"), Set("b")) { ran.add("mid") },
      act("leaf", Set("b"), Set("c")) { ran.add("leaf") },
      act("other", Set("raw"), Set("d")) { ran.add("other") })
    val res = Orchestrator.run(spark, "skip", acts)
    assert(!res.succeeded)
    assert(res.statusOf("bad") === "Failed")
    assert(res.statusOf("mid") === "Skipped")
    assert(res.statusOf("leaf") === "Skipped")
    assert(res.statusOf("other") === "Succeeded")
    assert(ran.toArray.map(_.toString).toSet === Set("other"))
    // the skip rows carry the failed upstream for triage
    assert(res.runs.find(_.activity == "mid").get.error.contains("bad"))
  }

  test("per-attempt timeout surfaces as TimedOut and counts as a failure") {
    val slow = act("slow", Set("raw"), Set("out"),
      Policy(timeoutMs = 50)) { Thread.sleep(5000) }
    val res = Orchestrator.run(spark, "timeouts", Seq(slow))
    assert(res.statusOf("slow") === "TimedOut")
    assert(!res.succeeded)
  }

  test("publish-time validation: cycles and duplicate producers raise") {
    intercept[IllegalArgumentException] {
      validate(Seq(
        act("a", Set("y"), Set("x")) {},
        act("b", Set("x"), Set("y")) {}))
    }
    intercept[IllegalArgumentException] {
      validate(Seq(
        act("a", Set(), Set("x")) {},
        act("b", Set(), Set("x")) {}))
    }
    intercept[IllegalArgumentException] {
      validate(Seq(act("a", Set(), Set("x")) {}, act("a", Set(), Set("y")) {}))
    }
  }

  test("journal lands as a DataFrame with one row per attempt") {
    val res = Orchestrator.run(spark, "df", Seq(act("only", Set("raw"), Set("out")) {}))
    val df = journalDf(spark, res)
    assert(df.columns.toSet === Set("pipeline", "activity", "attempt",
      "status", "start_ms", "duration_ms", "error"))
    assert(df.count() === 1)
    assert(df.head().getAs[String]("pipeline") === "df")
  }
}
