package graft.catalog

/** Physical table policy — the WITH(...) clause of the reference's
  * CREATE TABLE (SURVEY.md §1.1): distribution × layout × partitioning
  * (reference: samples/databases/wide-world-importers/tables/fact.sale.sql:27-48,
  * dimension.city.sql:19-23).
  */
sealed trait Distribution { def describe: String }
object Distribution {
  /** DISTRIBUTION = HASH(col): bucketed layout for collocated joins; the
    * reference hash-distributes over 60 distributions (whitepaper.md:37).
    */
  final case class Hash(column: String, buckets: Int = 60) extends Distribution {
    val describe = s"hash($column,$buckets)"
  }
  /** DISTRIBUTION = ROUND_ROBIN: writer-default spread. */
  case object RoundRobin extends Distribution { val describe = "round_robin" }
  /** DISTRIBUTION = REPLICATE: broadcast-class table (≤ ~2 GB guidance,
    * reference: samples/scripts/data-load/README.md:7); marks the table for
    * the auto-broadcast rule.
    */
  case object Replicate extends Distribution { val describe = "replicate" }
}

sealed trait Layout { def describe: String }
object Layout {
  /** CLUSTERED COLUMNSTORE INDEX ≈ parquet columnar (rowgroups ≈ parquet row
    * groups).
    */
  case object Columnstore extends Layout { val describe = "cci" }
  /** CLUSTERED INDEX (cols) ≈ sort-within-partitions at write for locality /
    * row-group min-max pruning.
    */
  final case class Clustered(columns: Seq[String]) extends Layout {
    val describe = s"clustered(${columns.mkString(",")})"
  }
  /** HEAP ≈ unsorted staging write. */
  case object Heap extends Layout { val describe = "heap" }
}

/** PARTITION (col RANGE RIGHT ...) monthly ≈ parquet directory partitioning on
  * a derived floor-to-month key (RANGE RIGHT boundary value falls in the right
  * partition — trunc-to-month has exactly that semantic).
  */
final case class MonthPartition(column: String)

final case class TablePolicy(
    distribution: Distribution = Distribution.RoundRobin,
    layout: Layout = Layout.Columnstore,
    partition: Option[MonthPartition] = None)

object TablePolicy {
  val PropDistribution = "graft.distribution"
  val PropLayout = "graft.layout"
  val PropPartition = "graft.partition"

  private val HashRe = """hash\(([^,]+),(\d+)\)""".r
  private val ClusteredRe = """clustered\((.*)\)""".r
  private val MonthRe = """month\((.+)\)""".r

  /** Inverse of the `describe` strings Ctas writes into TBLPROPERTIES — so
    * maintenance jobs (compaction, replicated-cache refresh) can recover and
    * preserve a table's physical policy.
    */
  def fromProps(props: Map[String, String]): TablePolicy = TablePolicy(
    distribution = props.get(PropDistribution) match {
      case Some(HashRe(c, n)) => Distribution.Hash(c, n.toInt)
      case Some("replicate") => Distribution.Replicate
      case _ => Distribution.RoundRobin
    },
    layout = props.get(PropLayout) match {
      case Some(ClusteredRe(cs)) => Layout.Clustered(cs.split(",").toSeq)
      case Some("heap") => Layout.Heap
      case _ => Layout.Columnstore
    },
    partition = props.get(PropPartition) match {
      case Some(MonthRe(c)) => Some(MonthPartition(c))
      case _ => None
    })

  /** Read a table's policy back from the catalog. */
  def of(spark: org.apache.spark.sql.SparkSession, table: String): TablePolicy =
    fromProps(spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap)
}
