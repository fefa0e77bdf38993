package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TPC-H-ish star schema plus
  * `events`/`documents`/`embeddings`; see /root/repo/TESTDATA.md).
  *
  * Reads bind columns by name from the parquet footers — schemas are never
  * hardcoded, mirroring the reference's schema-on-read external tables
  * (reference: samples/scripts/data-load/CTASLoad-Example.sql:67-83).
  */
object Tables {
  // Footer-derived schemas, remembered per path: the testdata is immutable,
  // and re-inferring the schema costs a footer read + file listing on EVERY
  // query — measurable across a 60-query bench run. (At 100 TB the analog is
  // the catalog: saveAsTable'd tables carry their schema and never infer.)
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // The driver writes parquet TIMESTAMP columns with isAdjustedToUTC =
    // false, which Spark 4 infers as TIMESTAMP_NTZ by default. The whole
    // engine (and the DuckDB oracle) treats those values as UTC instants —
    // every session pins spark.sql.session.timeZone=UTC — so read them as
    // plain TimestampType: same microsecond values, and the temporal
    // function surface (unix_millis, window(), watermarks) stays available.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw long (nanos since epoch) under the legacy flag. Convert
    * to microsecond TimestampType by truncation — the same truncation DuckDB
    * applies, so oracle comparisons agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    val withTs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division — double `/` would lose precision above 2^53 ns.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
    parallelized(withTs)
  }
  def documents(s: SparkSession, d: String): DataFrame =
    parallelized(apply(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    parallelized(apply(s, d, "embeddings"))

  /** Small-input parallelism guard for CPU-heavy per-row pipelines (shingle
    * explosion, fingerprinting, embedding math): a table that arrives as
    * fewer splits than the cluster has cores would run its whole map stage
    * on a fraction of the machine — a single-row-group parquet file is ONE
    * split no matter what `maxPartitionBytes` says. Repartition up to the
    * default parallelism in that case; at scale (splits ≥ cores) this is a
    * no-op, so no shuffle is ever added to a 100 TB scan.
    */
  def parallelized(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Keyed variant of [[parallelized]] for fact scans feeding expensive
    * per-row pipelines (md5 fingerprint fan-outs, DECIMAL scoring): hash
    * repartitioning by a unique-ish key spreads the map work without the
    * local sort a round-robin `repartition(n)` pays
    * (spark.sql.execution.sortBeforeRepartition — needed there for retry
    * determinism; a hash exchange is deterministic by construction).
    * Same scale posture as [[parallelized]]: a no-op whenever the scan
    * already arrives as ≥ cores splits, so no shuffle is added at 100 TB.
    */
  def parallelizedBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, keys: _*)
    else df
  }
}
