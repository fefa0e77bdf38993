package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Graph analytics over the star schema: the supply network ranked as a
  * graph. Nodes are suppliers and customers; an undirected edge links a
  * supplier to every customer it shipped to (via lineitem ⋈ orders).
  * Supplier and customer keys overlap numerically, so nodes are tagged into
  * one id space: supplier k → 2k, customer k → 2k+1.
  */
object GraphQueries {

  private val PrIters = 3

  /** q105: PageRank centrality of the supply network — which suppliers and
    * customers sit at the centre of the order flow. Symmetrized bipartite
    * edges (so no node dangles), [[Graph.pageRankInt]] exact integer
    * fixed-point ranks, top 25 by rank with id as the deterministic
    * tie-break. The oracle unrolls the three iterations as chained CTEs —
    * integer arithmetic makes every engine agree bit-for-bit.
    */
  val q105PageRank: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"),
        (col("o_custkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRankInt(edges, PrIters)
      .orderBy(col("r").desc, col("id"))
      .limit(25)
      .select(
        when(col("id") % 2 === 0, lit("supplier"))
          .otherwise(lit("customer")).as("node_kind"),
        expr("id div 2").as("node_key"),
        col("r").as("rank_micro"))
  }

  val q105Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT 2 * l_suppkey AS src, 2 * o_custkey + 1 AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |s1 AS (SELECT e.dst AS id, SUM(r0.r // d.outdeg) AS s
      |       FROM edges e JOIN r0 ON e.src = r0.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r1 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS r
      |       FROM nodes n LEFT JOIN s1 ON n.id = s1.id),
      |s2 AS (SELECT e.dst AS id, SUM(r1.r // d.outdeg) AS s
      |       FROM edges e JOIN r1 ON e.src = r1.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r2 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS r
      |       FROM nodes n LEFT JOIN s2 ON n.id = s2.id),
      |s3 AS (SELECT e.dst AS id, SUM(r2.r // d.outdeg) AS s
      |       FROM edges e JOIN r2 ON e.src = r2.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r3 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(s3.s, 0)) // 100 AS BIGINT) AS r
      |       FROM nodes n LEFT JOIN s3 ON n.id = s3.id),
      |top AS (SELECT id, r FROM r3 ORDER BY r DESC, id LIMIT 25)
      |SELECT CASE WHEN id % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_kind,
      |  id // 2 AS node_key, r AS rank_micro
      |FROM top""".stripMargin

  def queries: Map[String, Q] = Map(
    "q105_pagerank" -> q105PageRank)

  def oracles: Map[String, String] = Map(
    "q105_pagerank" -> q105Sql)
}
