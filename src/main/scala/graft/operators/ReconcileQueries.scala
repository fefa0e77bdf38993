package graft.operators

import graft.{Q, Tables}
import graft.functions.TSql._
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-reconciliation operators — the "did the replica/load drift?" surface
  * every warehouse runs after a migration, a CDC pipeline, or a backup
  * restore (the reference's deployment + backup scripts assume it:
  * samples/arm-templates + LatestBackup tooling). Snapshot B is synthesized
  * from snapshot A (= orders) by pure key arithmetic, so both engines build
  * byte-identical inputs and the gate certifies the reconciliation logic
  * itself:
  *
  *   - q554 exact row diff: full-outer-join on the key, classify
  *     insert/delete/update/unchanged, with the row-conservation identity
  *     |B| = |A| − deletes + inserts shipped in-output.
  *   - q555 partition-checksum localization: per-month (count, Σ row-hash)
  *     fingerprints compared side-by-side — the merkle-style first pass
  *     that finds WHICH partitions differ before any row-level work.
  *
  * Scale posture: q555 is the 100 TB path (one aggregate per side, compare
  * |months| fingerprints); q554's row-level join is what you run on the few
  * partitions q555 flags. Running both on the same synthetic drift makes
  * the pair self-certifying: months q555 flags are exactly the months
  * q554's changed rows live in.
  */
object ReconcileQueries {

  /** Synthetic drift rules (pure key arithmetic, identical in both
    * engines): delete keys ≡ 0 (mod 97), bump totalprice by 500 cents on
    * keys ≡ 0 (mod 101), and insert a clone with key+10⁹ for keys ≡ 0
    * (mod 113).
    */
  private val DelMod = 97L
  private val UpdMod = 101L
  private val InsMod = 113L
  private val InsOffset = 1000000000L

  /** Snapshot A: (k, mm, price_c). */
  private def snapA(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey").cast("long").as("k"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("mm"),
      cents(col("o_totalprice")).as("price_c"))

  /** Snapshot B: A minus deletes, with updates applied and clones added. */
  private def snapB(s: SparkSession, dir: String): DataFrame = {
    val a = snapA(s, dir)
    val kept = a.filter(col("k") % DelMod =!= 0)
      .withColumn("price_c",
        when(col("k") % UpdMod === 0, col("price_c") + 500L)
          .otherwise(col("price_c")))
    val inserted = a.filter(col("k") % InsMod === 0)
      .select((col("k") + InsOffset).as("k"), col("mm"), col("price_c"))
    kept.unionAll(inserted)
  }

  private val snapBSql: String =
    s"""SELECT k, mm,
       |    CASE WHEN k % $UpdMod = 0 THEN price_c + 500 ELSE price_c END
       |      AS price_c
       |  FROM a WHERE k % $DelMod <> 0
       |  UNION ALL
       |  SELECT k + $InsOffset, mm, price_c FROM a WHERE k % $InsMod = 0"""
      .stripMargin

  // ------------------------- q554: exact row-level snapshot diff (classify)

  /** q554: the row-level diff — one full outer join on the key, each row
    * classified, plus the conservation identity as in-output certificate.
    * The price-delta total is the "how much money moved" reconciliation
    * number a finance close actually signs off on.
    */
  val q554TableDiff: Q = (s, dir) => {
    val a = snapA(s, dir).select(col("k").as("ka"), col("price_c").as("pa"))
    val b = snapB(s, dir).select(col("k").as("kb"), col("price_c").as("pb"))
    val d = a.join(b, col("ka") === col("kb"), "full_outer")
      .select(
        when(col("ka").isNull, lit("insert"))
          .when(col("kb").isNull, lit("delete"))
          .when(col("pa") =!= col("pb"), lit("update"))
          .otherwise(lit("unchanged")).as("action"),
        coalesce(col("pb"), lit(0L)).as("pb"),
        coalesce(col("pa"), lit(0L)).as("pa"))
    val counts = d.groupBy(col("action"))
      .agg(count(lit(1)).as("n"), sum(col("pb") - col("pa")).as("delta_c"))
    val cert = counts.agg(
      sum(when(col("action") =!= "delete", col("n")).otherwise(0L))
        .as("b_rows"),
      sum(when(col("action") =!= "insert", col("n")).otherwise(0L))
        .as("a_rows"))
    counts.crossJoin(broadcast(cert))
      .select(col("action"), col("n"), col("delta_c"),
        col("a_rows"), col("b_rows"))
      .orderBy(col("action"))
  }

  val q554Sql: String =
    s"""WITH a AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS k,
       |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
       |      AS mm,
       |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
       |  FROM orders),
       |b AS (
       |$snapBSql),
       |d AS (
       |  SELECT CASE WHEN a.k IS NULL THEN 'insert'
       |      WHEN b.k IS NULL THEN 'delete'
       |      WHEN a.price_c <> b.price_c THEN 'update'
       |      ELSE 'unchanged' END AS action,
       |    COALESCE(b.price_c, 0) AS pb, COALESCE(a.price_c, 0) AS pa
       |  FROM a FULL OUTER JOIN b ON a.k = b.k),
       |counts AS (
       |  SELECT action, COUNT(*) AS n, SUM(pb - pa) AS delta_c
       |  FROM d GROUP BY 1),
       |cert AS (
       |  SELECT SUM(CASE WHEN action <> 'delete' THEN n ELSE 0 END)
       |      AS b_rows,
       |    SUM(CASE WHEN action <> 'insert' THEN n ELSE 0 END) AS a_rows
       |  FROM counts)
       |SELECT action, CAST(n AS BIGINT) AS n,
       |  CAST(delta_c AS BIGINT) AS delta_c,
       |  CAST(a_rows AS BIGINT) AS a_rows, CAST(b_rows AS BIGINT) AS b_rows
       |FROM counts CROSS JOIN cert
       |ORDER BY action""".stripMargin

  // ------------- q555: partition-checksum localization (merkle first pass)

  /** q555: the cheap first pass — per month and side: row count and the
    * sum of portable row hashes (accumulated in DECIMAL(38,0), so the
    * fingerprint is exact and order-independent). A month matches iff
    * both members agree; the output carries every month with its verdict
    * plus each side's fingerprint, and at 100 TB this is the ONLY full
    * scan reconciliation needs — q554's row join then runs on the flagged
    * months alone.
    */
  val q555ChecksumReconcile: Q = (s, dir) => {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col("mm"),
        Text.portableHash(concat_ws("|",
          col("k").cast("string"), col("price_c").cast("string"))).as("h"))
        .groupBy(col("mm"))
        .agg(count(lit(1)).as(s"n_$side"),
          sum(col("h").cast("decimal(38,0)")).cast("decimal(38,0)")
            .as(s"h_$side"))
    fp(snapA(s, dir), "a")
      .join(fp(snapB(s, dir), "b"), Seq("mm"), "full_outer")
      .select(col("mm"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("h_a"), lit(0L).cast("decimal(38,0)")).cast("string")
          .as("fp_a"),
        coalesce(col("h_b"), lit(0L).cast("decimal(38,0)")).cast("string")
          .as("fp_b"))
      .withColumn("matches",
        (col("n_a") === col("n_b") && col("fp_a") === col("fp_b"))
          .cast("long"))
      .orderBy(col("mm"))
  }

  val q555Sql: String =
    s"""WITH a AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS k,
       |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
       |      AS mm,
       |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
       |  FROM orders),
       |b AS (
       |$snapBSql),
       |fa AS (
       |  SELECT mm, COUNT(*) AS n_a,
       |    SUM(CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
       |      CAST(price_c AS VARCHAR)), 1, 15)) AS BIGINT) AS HUGEINT))
       |      AS h_a
       |  FROM a GROUP BY 1),
       |fb AS (
       |  SELECT mm, COUNT(*) AS n_b,
       |    SUM(CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
       |      CAST(price_c AS VARCHAR)), 1, 15)) AS BIGINT) AS HUGEINT))
       |      AS h_b
       |  FROM b GROUP BY 1)
       |SELECT mm, CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
       |  CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
       |  CAST(COALESCE(h_a, 0) AS VARCHAR) AS fp_a,
       |  CAST(COALESCE(h_b, 0) AS VARCHAR) AS fp_b,
       |  CAST(CASE WHEN COALESCE(n_a, 0) = COALESCE(n_b, 0)
       |    AND COALESCE(h_a, 0) = COALESCE(h_b, 0) THEN 1 ELSE 0 END
       |    AS BIGINT) AS matches
       |FROM fa FULL OUTER JOIN fb USING (mm)
       |ORDER BY mm""".stripMargin

  // ---------------- q569: MERGE replay — the diff stream rebuilds the target

  /** q569: the MERGE/CDC-apply certification — the change stream q554
    * classifies (inserts, updates, deletes) is applied back onto snapshot
    * A with one MERGE-shaped pass (anti-join the deletes, overlay the
    * update images, append the inserts), and the rebuilt table is
    * compared against the true B by count and order-independent content
    * fingerprint. fp_match = 1 proves the diff stream is SUFFICIENT to
    * replay the target — the property a CDC pipeline needs before it
    * trusts incremental apply over full reload. All counts and both
    * fingerprints ship in-output.
    */
  val q569MergeReplay: Q = (s, dir) => {
    val a = snapA(s, dir)
    val b = snapB(s, dir)
    val changes = a.select(col("k").as("ka"), col("price_c").as("pa"))
      .join(b.select(col("k").as("kb"), col("mm").as("mmb"),
        col("price_c").as("pb")), col("ka") === col("kb"), "full_outer")
      .select(
        when(col("ka").isNull, lit("insert"))
          .when(col("kb").isNull, lit("delete"))
          .when(col("pa") =!= col("pb"), lit("update"))
          .otherwise(lit("unchanged")).as("action"),
        coalesce(col("kb"), col("ka")).as("k"), col("mmb"), col("pb"))
      .filter(col("action") =!= "unchanged")
      .localCheckpoint()
    // MERGE-shaped apply: delete, overlay updates, append inserts
    val deletes = changes.filter(col("action") === "delete")
      .select(col("k").as("kd"))
    val updates = changes.filter(col("action") === "update")
      .select(col("k").as("ku"), col("pb").as("pu"))
    val inserts = changes.filter(col("action") === "insert")
      .select(col("k"), col("mmb").as("mm"), col("pb").as("price_c"))
    val replayed = a.join(deletes, col("k") === col("kd"), "left_anti")
      .join(updates, col("k") === col("ku"), "left")
      .select(col("k"), col("mm"),
        coalesce(col("pu"), col("price_c")).as("price_c"))
      .unionAll(inserts)
    def fp(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"),
        sum(Text.portableHash(concat_ws("|", col("k").cast("string"),
          col("price_c").cast("string"))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("string").as("fp"))
    val counts = changes.groupBy().agg(
      sum((col("action") === "insert").cast("long")).as("n_ins"),
      sum((col("action") === "update").cast("long")).as("n_upd"),
      sum((col("action") === "delete").cast("long")).as("n_del"))
    fp(replayed).select(col("n").as("n_replayed"), col("fp").as("replay_fp"))
      .crossJoin(broadcast(fp(b)
        .select(col("n").as("n_target"), col("fp").as("target_fp"))))
      .crossJoin(broadcast(counts))
      .select(col("n_replayed"), col("n_target"),
        col("n_ins"), col("n_upd"), col("n_del"),
        col("replay_fp"), col("target_fp"),
        (col("n_replayed") === col("n_target") &&
          col("replay_fp") === col("target_fp")).cast("long").as("fp_match"))
  }

  val q569Sql: String =
    s"""WITH a AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS k,
       |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
       |      AS mm,
       |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
       |  FROM orders),
       |b AS (
       |$snapBSql),
       |changes AS (
       |  SELECT CASE WHEN a.k IS NULL THEN 'insert'
       |      WHEN b.k IS NULL THEN 'delete'
       |      WHEN a.price_c <> b.price_c THEN 'update'
       |      ELSE 'unchanged' END AS action,
       |    COALESCE(b.k, a.k) AS k, b.mm AS mmb, b.price_c AS pb
       |  FROM a FULL OUTER JOIN b ON a.k = b.k),
       |ch AS (SELECT * FROM changes WHERE action <> 'unchanged'),
       |replayed AS (
       |  SELECT a.k, a.mm,
       |    COALESCE(u.pb, a.price_c) AS price_c
       |  FROM a
       |  LEFT JOIN (SELECT k, pb FROM ch WHERE action = 'update') u
       |    ON a.k = u.k
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ch d WHERE d.action = 'delete' AND d.k = a.k)
       |  UNION ALL
       |  SELECT k, mmb, pb FROM ch WHERE action = 'insert'),
       |fpr AS (
       |  SELECT COUNT(*) AS n_replayed,
       |    CAST(SUM(CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|'
       |      || CAST(price_c AS VARCHAR)), 1, 15)) AS BIGINT) AS HUGEINT))
       |      AS VARCHAR) AS replay_fp
       |  FROM replayed),
       |fpt AS (
       |  SELECT COUNT(*) AS n_target,
       |    CAST(SUM(CAST(CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '|'
       |      || CAST(price_c AS VARCHAR)), 1, 15)) AS BIGINT) AS HUGEINT))
       |      AS VARCHAR) AS target_fp
       |  FROM b),
       |cnt AS (
       |  SELECT SUM(CASE WHEN action = 'insert' THEN 1 ELSE 0 END) AS n_ins,
       |    SUM(CASE WHEN action = 'update' THEN 1 ELSE 0 END) AS n_upd,
       |    SUM(CASE WHEN action = 'delete' THEN 1 ELSE 0 END) AS n_del
       |  FROM ch)
       |SELECT CAST(n_replayed AS BIGINT) AS n_replayed,
       |  CAST(n_target AS BIGINT) AS n_target,
       |  CAST(n_ins AS BIGINT) AS n_ins, CAST(n_upd AS BIGINT) AS n_upd,
       |  CAST(n_del AS BIGINT) AS n_del,
       |  replay_fp, target_fp,
       |  CAST(CASE WHEN n_replayed = n_target AND replay_fp = target_fp
       |    THEN 1 ELSE 0 END AS BIGINT) AS fp_match
       |FROM fpr CROSS JOIN fpt CROSS JOIN cnt""".stripMargin

  // ------------------------------------------------------------- registry

  def queries: Map[String, Q] = Map(
    "q554_table_diff" -> q554TableDiff,
    "q555_checksum_reconcile" -> q555ChecksumReconcile,
    "q569_merge_replay" -> q569MergeReplay)

  def oracles: Map[String, String] = Map(
    "q554_table_diff" -> q554Sql,
    "q555_checksum_reconcile" -> q555Sql,
    "q569_merge_replay" -> q569Sql)
}
