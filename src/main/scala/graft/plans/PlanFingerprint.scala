package graft.plans

import org.apache.spark.sql.DataFrame

/** Canonical physical-plan fingerprints — the stable identity of "the same
  * query planned the same way", independent of per-run artifacts. Two uses:
  *
  *  - PLAN-DRIFT DETECTION: record fingerprints in CI; a dependency bump or
  *    config change that flips a join strategy or loses a pushed filter
  *    changes the fingerprint and fails the build long before it burns a
  *    cluster (the regression the plan-shape specs catch one query at a
  *    time, generalized).
  *  - RESULT CACHING: [[ResultCache]] keys result reuse on the fingerprint,
  *    the engine-side analog of the warehouse's result-set caching (the
  *    product the reference samples target caches result sets keyed on
  *    query text + data version; a canonical plan is the stronger key —
  *    two spellings of the same plan share one entry).
  *
  * Canonicalization strips what varies run to run — expression ids
  * (`name#123`), codegen/plan ids, cached-RDD numbers, object addresses —
  * and keeps everything that matters: operators, join strategies, pushed
  * filters, read schemas.
  */
object PlanFingerprint {

  /** The normalized plan text (exposed for diffing in drift reports).
    *
    * Deliberately conservative: ONLY per-run artifacts are stripped.
    * Scan locations, literal values, and filter constants all stay — two
    * queries over different directories or with different `IN (...)`
    * lists are different queries and must fingerprint differently
    * (anything else would let [[ResultCache]] serve wrong results).
    */
  def canonical(df: DataFrame): String = {
    val raw = df.queryExecution.executedPlan.toString
    raw
      .replaceAll("#\\d+", "#")             // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("\\[id=#?\\d+\\]", "[id=]") // exchange ids
      .replaceAll("\\*\\(\\d+\\)", "*()")    // whole-stage codegen stage ids
      .replaceAll("@[0-9a-f]{6,}", "@")      // object addresses
  }

  /** 128-bit hex fingerprint of the canonical plan. */
  def fingerprint(df: DataFrame): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.digest(canonical(df).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
