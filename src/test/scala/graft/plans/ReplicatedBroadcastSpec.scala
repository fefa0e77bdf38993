package graft.plans

import graft.SparkSpec
import graft.catalog.{Distribution, TablePolicy}
import graft.sources.Ctas
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

class ReplicatedBroadcastSpec extends SparkSpec {

  test("rule injects a broadcast hint for replicate-marked tables only") {
    Ctas.create(spark, graft.Tables.nation(spark, sfDir), "nation_rep2",
      TablePolicy(Distribution.Replicate))
    Ctas.create(spark, graft.Tables.customer(spark, sfDir), "cust_plain",
      TablePolicy(Distribution.RoundRobin))
    val plan = spark.table("nation_rep2")
      .join(spark.table("cust_plain"),
        spark.table("nation_rep2")("n_nationkey") ===
          spark.table("cust_plain")("c_nationkey"))
      .queryExecution.analyzed
    val hinted = ReplicatedBroadcastRule(plan)
    val hints = hinted.collect { case h: ResolvedHint => h }
    assert(hints.size === 1, s"expected exactly one hint:\n$hinted")
    // idempotent: re-application adds nothing
    assert(ReplicatedBroadcastRule(hinted).collect {
      case h: ResolvedHint => h
    }.size === 1)
  }

  test("session with GraftExtensions broadcasts replicated tables end-to-end") {
    // Build a sibling session on the same SparkContext with the extensions
    // installed (the production wiring: spark.sql.extensions=GraftExtensions).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extSession = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      Ctas.create(extSession, graft.Tables.nation(extSession, sfDir), "nation_rep3",
        TablePolicy(Distribution.Replicate))
      // disable size-based auto-broadcast so only the rule can trigger it
      extSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rep = extSession.table("nation_rep3")
      val cust = graft.Tables.customer(extSession, sfDir)
      val joined = rep.join(cust, rep("n_nationkey") === cust("c_nationkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"replicated table should broadcast without an explicit hint:\n$physical")
    } finally {
      extSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
