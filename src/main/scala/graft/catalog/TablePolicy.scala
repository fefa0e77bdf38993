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
}
