package graft.maintenance

import graft.{SparkSpec, Tables}
import graft.catalog.{Distribution, TablePolicy}
import graft.sources.Ctas

class ReplicatedCacheSpec extends SparkSpec {

  test("refreshAll touches exactly the replicate-marked tables and warms cache") {
    Ctas.create(spark, Tables.region(spark, sfDir), "rep_region",
      TablePolicy(Distribution.Replicate))
    Ctas.create(spark, Tables.nation(spark, sfDir), "plain_nation",
      TablePolicy(Distribution.RoundRobin))
    val refreshed = ReplicatedCache.refreshAll(spark)
    assert(refreshed.contains("rep_region"))
    assert(!refreshed.contains("plain_nation"))
    assert(spark.catalog.isCached("rep_region"))
    spark.catalog.uncacheTable("rep_region")
  }
}
