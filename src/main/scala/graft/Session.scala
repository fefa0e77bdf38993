package graft

import org.apache.spark.sql.SparkSession

/** Engine session factory (SURVEY.md §7.1 module 1): one place that wires the
  * engine posture — UTC, AQE (runtime re-planning ≈ the reference's
  * distribution-aware re-optimization), CBO over collected statistics,
  * shuffle partitions sized to the local cores (not the 200 default), the
  * replicated-table auto-broadcast extension, and the T-SQL SQL dialect.
  *
  * ANSI stays off deliberately: the T-SQL compatibility layer relies on
  * non-ANSI null-on-bad-cast semantics. Integer-overflow safety for
  * high-magnitude composite sums is handled where it matters instead —
  * those aggregates accumulate in DECIMAL(38,0) (exact to ~10^27 rows per
  * group, NULL on overflow) rather than wrapping int64; see q01/q47.
  */
object Session {

  final case class EngineConf(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Option[Int] = None,
      driverMemory: String = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"),
      broadcastThresholdBytes: Long = 10L * 1024 * 1024,
      cbo: Boolean = true,
      warehouseDir: Option[String] = None)

  def build(conf: EngineConf = EngineConf()): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[${conf.cores}]")
      .config("spark.sql.shuffle.partitions",
        conf.shufflePartitions.getOrElse(conf.cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", conf.cbo.toString)
      .config("spark.sql.cbo.joinReorder.enabled", conf.cbo.toString)
      .config("spark.sql.autoBroadcastJoinThreshold",
        conf.broadcastThresholdBytes.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
    val withWh = conf.warehouseDir.fold(b)(d =>
      b.config("spark.sql.warehouse.dir", d))
    val spark = withWh.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TSqlRegistry.register(spark)
    spark
  }
}
