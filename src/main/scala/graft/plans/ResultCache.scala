package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Result-set caching keyed on the canonical plan fingerprint — the
  * engine-side analog of the warehouse feature the reference's product
  * exposes as RESULT_SET_CACHING: identical queries over unchanged data
  * return the stored result without re-executing the plan.
  *
  * Honesty about staleness is the caller's `dataVersion`: the cache key is
  * (plan fingerprint, dataVersion), so a load that advances the version
  * naturally misses — exactly how the warehouse invalidates on data
  * modification. `invalidate()` clears everything (the DDL path).
  *
  * Entries are localCheckpointed at first execution, so a hit serves
  * materialized blocks (no rescan of the source — asserted in the spec by
  * the absence of a file scan in the served plan). Hit/miss counters feed
  * `vw_result_cache` for the monitoring surface.
  */
final class ResultCache(spark: SparkSession, maxEntries: Int = 64) {

  // LRU eviction only FORGETS the entry — it never unpersists, because a
  // caller may still hold the returned frame, and a localCheckpointed
  // frame whose blocks are dropped cannot be recomputed (truncated
  // lineage). Block reclamation belongs to Spark's storage eviction and
  // to invalidate(), whose contract voids outstanding handles explicitly.
  private val entries =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean =
        size() > maxEntries
    }
  private var hitCount = 0L
  private var missCount = 0L

  /** Serve `df`'s result from cache, executing and storing it on miss. */
  def get(df: DataFrame, dataVersion: String = ""): DataFrame =
    synchronized {
      val key = PlanFingerprint.fingerprint(df) + "|" + dataVersion
      val cached = entries.get(key)
      if (cached != null) { hitCount += 1; cached }
      else {
        missCount += 1
        val mat = df.localCheckpoint()
        entries.put(key, mat)
        mat
      }
    }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def size: Int = synchronized(entries.size())

  /** Drop every entry AND its blocks (the on-DDL invalidation path).
    * Frames previously returned by get() become unusable — invalidation
    * means exactly that; callers re-fetch through the cache.
    */
  def invalidate(): Unit = synchronized {
    entries.values().forEach(_.unpersist())
    entries.clear()
  }

  /** One-row stats frame for the monitoring surface. */
  def statsDf: DataFrame = {
    import spark.implicits._
    Seq((hits, misses, size.toLong)).toDF("hits", "misses", "entries")
  }
}
