package graft.operators

import graft.{Q, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths:
  *  - brute-force exact top-k (the correctness baseline): probe set ⨯
  *    candidates with a broadcast of the (small) probe side — at scale the
  *    probe batch is what's broadcast, candidates stream by partition;
  *  - LSH-bucketed (the 100 TB path): random-hyperplane signatures bucket the
  *    space; each probe only scans its bucket, turning ANN into an equi-join.
  */
object SimilarityQueries {

  private val K = 5

  /** Exact brute-force cosine top-k for a 10-probe batch. Output is rank-only
    * (ints), so the result is robust to last-ulp float noise.
    */
  val q60KnnBrute: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Vectors.norm(col("embedding")).as("nrm"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"),
        col("nrm").as("probe_nrm"))
    // norms are precomputed per row (identical arithmetic, evaluated once);
    // each pair costs a single codegen'd dot product
    val sims = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (Vectors.dot(col("embedding"), col("probe_vec")) /
          (col("nrm") * col("probe_nrm"))).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"))
  }

  /** Embedding norm/label rollup: per-row sequential-fold norms (exact given
    * identical IEEE order), rounded per row to exact integer cents before the
    * rollup so the sum is int64 arithmetic — engine-exact (a decimal/double
    * fold would be summation-order-sensitive).
    */
  val q62NormStats: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    e.select(col("label"), col("vec_id"),
        round(Vectors.norm(col("embedding")) * 100, 0).cast("long").as("nrm_c"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("nrm_c")).as("total_norm_c"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))
  }

  /** LSH-bucketed ANN (no SQL oracle — approximate by construction): 8
    * hyperplanes → 256 buckets; probes meet candidates through an equi-join
    * on bucket id, then exact cosine re-ranks within the bucket.
    */
  val q61AnnLsh: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val bucketed = e.select(col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"),
      Vectors.hyperplaneBucket(
        Vectors.hyperplaneSignature(col("embedding"), 64, 8)).as("bucket"))
    val probes = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"),
        col("nrm").as("probe_nrm"), col("bucket"))
    val cands = bucketed.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (Vectors.dot(col("embedding"), col("probe_vec")) /
          (col("nrm") * col("probe_nrm"))).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs (no SQL oracle — LSH recall is
    * approximate by construction): coarse 4-plane signature buckets the
    * space, candidate pairs within a bucket are verified with exact cosine ≥
    * 0.4. The dedup-by-embedding member of the dedup family — at 100 TB the
    * bucket join bounds the pair fan-out to collisions, never n².
    */
  val q63CosineNearDup: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val bucketed = e.select(col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"),
      Vectors.hyperplaneBucket(
        Vectors.hyperplaneSignature(col("embedding"), 64, 4)).as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (Vectors.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") >= 0.4)
      .select(col("vec_a"), col("vec_b"))
  }

  val queries: Map[String, Q] = Map(
    "q60_knn_brute" -> q60KnnBrute,
    "q61_ann_lsh" -> q61AnnLsh,
    "q62_norm_stats" -> q62NormStats,
    "q63_cosine_neardup" -> q63CosineNearDup)

  /** q60's oracle mirrors the double-precision sequential fold via UNNEST
    * ordinality — exact same IEEE operation order as the Spark side.
    */
  val oracles: Map[String, String] = Map(
    "q60_knn_brute" ->
      """WITH probes AS (
        |  SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings WHERE vec_id < 10),
        |sims AS (
        |  SELECT p.probe_id, e.vec_id AS neighbor_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(p.probe_vec AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(p.probe_vec AS DOUBLE[]), CAST(p.probe_vec AS DOUBLE[])))) AS sim
        |  FROM embeddings e CROSS JOIN probes p
        |  WHERE e.vec_id <> p.probe_id)
        |SELECT probe_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT probe_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM sims) t
        |WHERE rnk <= 5""".stripMargin,
    "q62_norm_stats" ->
      """SELECT label,
        |  COUNT(*) AS n_vecs,
        |  CAST(SUM(CAST(ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * 100) AS BIGINT)) AS BIGINT) AS total_norm_c,
        |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
        |FROM embeddings GROUP BY label""".stripMargin)
}
