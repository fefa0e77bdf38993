package graft.operators

import graft.{Q, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Training-data text pipeline over the `documents` table: deduplication
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash), token/quality statistics,
  * language identification, winnowing fingerprints.
  *
  * Scale design: every dedup variant avoids the O(n²) all-pairs comparison.
  * Exact dedup is a hash groupBy; Jaccard joins only on shared shingles;
  * MinHash/SimHash join only within LSH bands/chunks — each is a shuffle on a
  * key whose fan-out is bounded, which is what survives 100 TB. The all-pairs
  * oracle check is only feasible because the test corpus is small.
  */
object TextQueries {

  /** Exact deduplication: group by content hash (md5), keep the minimum
    * doc_id as the canonical representative. A pure hash aggregate — one
    * shuffle on the 128-bit digest, no skew (hash keys are uniform).
    */
  val q50DedupExact: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  val q50Sql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Token statistics: counts, distinct counts, boundary tokens. */
  val q51TokenStats: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    val t = Text.tokens(col("text"))
    d.select(
      col("doc_id"),
      Text.tokenCount(col("text")).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      element_at(t, 1).as("first_tok"),
      element_at(t, -1).as("last_tok"),
      length(col("text")).as("n_chars"))
  }

  val q51Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
      |  CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_distinct,
      |  STRING_SPLIT(text, ' ')[1] AS first_tok,
      |  STRING_SPLIT(text, ' ')[-1] AS last_tok,
      |  CAST(LENGTH(text) AS INT) AS n_chars
      |FROM documents""".stripMargin

  /** Quality scoring: length/token/stopword-ratio heuristics with integer
    * arithmetic (engine-exact) and a CASE quality band.
    */
  val q52Quality: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    val t = Text.tokens(col("text"))
    val nTok = size(t)
    val nChars = length(col("text"))
    val nThe = size(filter(t, x => x === "the"))
    val avgTokLen100 = floor((nChars - nTok + 1) * 100.0 / nTok).cast("long")
    d.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nChars.as("n_chars"),
      nThe.as("n_stopword_the"),
      avgTokLen100.as("avg_token_len_x100"),
      when(nTok < 40, "short").when(nTok > 70, "long").otherwise("medium")
        .as("length_band"))
  }

  val q52Sql: String =
    """SELECT doc_id,
      |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
      |  CAST(LENGTH(text) AS INT) AS n_chars,
      |  CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x = 'the')) AS INT) AS n_stopword_the,
      |  CAST(FLOOR((LENGTH(text) - LEN(STRING_SPLIT(text, ' ')) + 1) * 100.0 / LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS avg_token_len_x100,
      |  CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 40 THEN 'short'
      |       WHEN LEN(STRING_SPLIT(text, ' ')) > 70 THEN 'long'
      |       ELSE 'medium' END AS length_band
      |FROM documents""".stripMargin

  /** Corpus rollup by language and source. */
  val q53LangRollup: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  val q53Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  COUNT(DISTINCT source) AS n_sources,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY lang""".stripMargin

  /** Near-duplicate detection by exact 3-gram-shingle Jaccard ≥ 0.3:
    * explode distinct shingles, self-join on shingle (docs sharing none never
    * meet — the join key bounds the fan-out), count intersections, compute
    * |A∩B| / |A∪B| exactly from integer counts.
    */
  val q54NgramJaccard: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    // Join on the 64-bit shingle hash instead of the shingle string: same
    // pairs (collision probability ~n²/2^64), ~3× lighter shuffle rows.
    val sh = d.select(col("doc_id"),
        explode(Text.shingleSet(col("text"), 3)).as("sh_str"))
      .select(col("doc_id"), xxhash64(col("sh_str")).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // (Size-ratio pruning from the set-similarity-join literature was
    // measured here and reverted: on uniform-length corpora the length filter
    // never prunes, and the cost is intersection-driven. The scale path for
    // heavy-duty near-dup remains MinHash/LSH — q55.)
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("sa.n_sh") + col("sb.n_sh") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
  }

  val q54Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t) - 2)) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b, n_inter,
      |  sa.n_sh + sb.n_sh - n_inter AS n_union,
      |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.3""".stripMargin

  /** MinHash + LSH near-dup candidates (no SQL oracle — driver rows-only
    * check): 32-component signature, 8 bands × 4 rows; docs sharing a band
    * bucket become candidate pairs, then candidates are verified with the
    * signature-estimated Jaccard ≥ 0.5.
    *
    * Scale path: only band buckets shuffle; the candidate join is on
    * (band_index, band_hash) so work is proportional to collisions, not n².
    */
  val q55MinhashLsh: Q = (s, dir) => {
    val k = 32
    val bands = 8
    val d = Tables.documents(s, dir)
    // Explode shingles to flat rows, then k min-aggregates: partial (map-side)
    // min means the shuffle carries |docs|×k longs, not the shingle stream —
    // this is the formulation that scales, and it codegens flat (no nested
    // array transforms).
    val sh = d.select(col("doc_id"),
      explode(Text.shingleSet(col("text"), 3)).as("shingle"))
    val sig = sh.groupBy(col("doc_id"))
      .agg(min(xxhash64(col("shingle"), lit(0))).as("m0"),
        (1 until k).map(i =>
          min(xxhash64(col("shingle"), lit(i))).as(s"m$i")): _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
        posexplode(Text.minhashBands(col("sig"), k, bands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
  }

  /** SimHash near-dup candidates (no SQL oracle): 64-bit fingerprints,
    * candidates share at least one of four 16-bit chunks (a Hamming-distance
    * LSH — any pair within Hamming ≤ 3 must agree on ≥ 1 chunk), verified
    * with exact Hamming distance ≤ 3.
    */
  val q56Simhash: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    // Same explode+aggregate formulation as MinHash: one xxhash64 per token
    // row, 64 ±1-vote partial sums (map-side combined), bits packed after the
    // shuffle — identical result to Text.simhash64, scalable codegen.
    val toks = d.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val votes = toks.groupBy(col("doc_id"))
      .agg(
        sum(when(col("h").bitwiseAND(shiftleft(lit(1L), 0)) =!= 0L, 1L)
          .otherwise(-1L)).as("b0"),
        (1 until 64).map(j =>
          sum(when(col("h").bitwiseAND(shiftleft(lit(1L), j)) =!= 0L, 1L)
            .otherwise(-1L)).as(s"b$j")): _*)
    val fp = votes.select(col("doc_id"),
      (0 until 64).map(j =>
        when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
    val chunked = fp.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map { c =>
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Text.hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
  }

  /** Winnowing fingerprints (no SQL oracle): per-doc fingerprint set size and
    * extremes — the primitive behind plagiarism-style containment detection.
    */
  val q57Fingerprint: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
    // Distributed winnowing: explode shingle hashes with position, take the
    // min over each w-row sliding window (window function — partial sort per
    // doc partition), keep the distinct mins. Scales as a single shuffle on
    // doc_id instead of per-row O(shingles × w) array copies.
    val w = 4
    val hashed = d.select(col("doc_id"),
        posexplode(Text.shingles(Text.tokens(col("text")), 3)))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    hashed
      .withColumn("win_min", min(col("h")).over(win))
      .filter(col("pos") >= w - 1)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("win_min")).as("n_fingerprints"),
        min(col("win_min")).as("min_fp"),
        max(col("win_min")).as("max_fp"))
  }

  /** Language-ID heuristic vs. the labelled lang column (no SQL oracle):
    * per-language confusion rollup.
    */
  val q58LangId: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.select(col("lang"), Text.langId(Text.tokens(col("text"))).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, Q] = Map(
    "q50_dedup_exact" -> q50DedupExact,
    "q51_token_stats" -> q51TokenStats,
    "q52_text_quality" -> q52Quality,
    "q53_lang_rollup" -> q53LangRollup,
    "q54_ngram_jaccard" -> q54NgramJaccard,
    "q55_minhash_lsh" -> q55MinhashLsh,
    "q56_simhash" -> q56Simhash,
    "q57_winnow_fingerprint" -> q57Fingerprint,
    "q58_lang_id" -> q58LangId)

  val oracles: Map[String, String] = Map(
    "q50_dedup_exact" -> q50Sql,
    "q51_token_stats" -> q51Sql,
    "q52_text_quality" -> q52Sql,
    "q53_lang_rollup" -> q53Sql,
    "q54_ngram_jaccard" -> q54Sql)
}
