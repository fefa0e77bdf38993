package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-pass SQL Global Optimization — the generator-side rewrite the
  * reference documents for BI workloads (reference: whitepaper.md:419-433):
  * a report compiles to an ordered sequence of passes (each a temp table);
  * before execution the plan is shrunk by
  *
  *  1. eliminating unused passes (created but never referenced later),
  *  2. reusing redundant passes (exact same definition → one pass),
  *  3. combining passes whose only difference is the SELECT list
  *     (same FROM/JOIN/WHERE/GROUP BY → one pass with the union of lists),
  *  4. combining passes whose only difference is the WHERE clause
  *     (same SELECT/FROM/JOIN/GROUP BY → predicates become CASE inside the
  *     aggregates, per-pass row counters preserve each pass's group set).
  *
  * Catalyst cannot do these (they are cross-STATEMENT rewrites — SURVEY.md
  * §4), so they live here at the query-builder layer. Execution materializes
  * passes as temp views (derived-table mode) or cached frames (temp-table
  * mode — the reference's documented fallback when a report exceeds ~20
  * passes, whitepaper.md:257,333).
  */
object MultiPass {

  /** One SQL pass. Components are SQL text; equality of components is the
    * pass-matching rule (the same textual criterion the reference's
    * generator applies).
    */
  final case class Pass(
      name: String,
      from: String,
      joins: Seq[String] = Nil, // full "JOIN t ON ..." fragments
      where: Option[String] = None,
      groupBy: Seq[String] = Nil,
      select: Seq[(String, String)]) { // alias -> expression SQL

    def sql: String = {
      val sel = select.map { case (a, e) => s"$e AS `$a`" }.mkString(", ")
      val j = if (joins.isEmpty) "" else joins.mkString(" ", " ", "")
      val w = where.fold("")(" WHERE " + _)
      val g = if (groupBy.isEmpty) "" else groupBy.mkString(" GROUP BY ", ", ", "")
      s"SELECT $sel FROM $from$j$w$g"
    }
  }

  /** A pass whose body is literal SQL (used for rewrite-generated views). */
  private final case class RawPass(name: String, text: String)

  /** Single-argument aggregate-call detector for the WHERE→CASE rewrite. */
  private val AggRe = """(?i)^(sum|min|max|avg|count)\s*\((.+)\)$""".r

  final case class Optimized(passes: Seq[Pass], views: Seq[(String, String)],
      original: Int) {
    def passCount: Int = passes.size
  }

  /** Apply rewrites 1–4. Returns the surviving passes plus alias views that
    * re-expose eliminated pass names over their merged replacements.
    */
  def optimize(passes: Seq[Pass], finalPass: String): Optimized = {
    require(passes.map(_.name).distinct.size == passes.size, "duplicate names")
    val byName = passes.map(p => p.name -> p).toMap

    // 1. unused-pass elimination: keep only passes reachable from the final.
    // WHERE and SELECT text count as references too — a pass read only by a
    // predicate subquery (WHERE x IN (SELECT ... FROM p)) is live (ADVICE r2).
    def refs(p: Pass): Set[String] = {
      val text =
        ((p.from +: p.joins) ++ p.where.toSeq ++ p.select.map(_._2)).mkString(" ")
      passes.map(_.name).filter(n => text.matches(s"(?s).*\\b$n\\b.*")).toSet
    }
    val used = {
      var acc = Set(finalPass)
      var frontier = Set(finalPass)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(n => byName.get(n).map(refs).getOrElse(Set.empty)) -- acc
        acc ++= frontier
      }
      acc
    }
    val live = passes.filter(p => used(p.name))

    // 2. redundant-pass reuse: identical definition → first name wins
    val canonical = scala.collection.mutable.Map[(String, Seq[String], Option[String], Seq[String], Seq[(String, String)]), String]()
    var aliases = Seq.empty[(String, String)] // name -> SELECT * view over target
    val deduped = live.flatMap { p =>
      val key = (p.from, p.joins, p.where, p.groupBy, p.select)
      canonical.get(key) match {
        case Some(first) =>
          aliases :+= (p.name -> s"SELECT * FROM $first"); None
        case None => canonical(key) = p.name; Some(p)
      }
    }

    // 3. SELECT-list merge: same FROM/JOIN/WHERE/GROUP BY
    val bySelShape = deduped.groupBy(p => (p.from, p.joins, p.where, p.groupBy))
    val selMerged = bySelShape.toSeq.sortBy(g => deduped.indexWhere(_.name == g._2.head.name)).flatMap {
      case (_, Seq(only)) => Seq(only)
      case (_, group)
          // an alias bound to two different expressions cannot merge
          if group.flatMap(_.select).groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1) =>
        val merged = group.head.copy(
          name = group.map(_.name).mkString("_"),
          select = group.flatMap(_.select).distinctBy(_._1))
        aliases ++= group.map { p =>
          val cols = p.select.map { case (a, _) => s"`$a`" }.mkString(", ")
          p.name -> s"SELECT $cols FROM ${merged.name}"
        }
        Seq(merged)
      case (_, group) => group
    }

    // 4. WHERE→CASE merge: same SELECT/FROM/JOIN/GROUP BY, aggregates only.
    // The aggregate's argument must survive being wrapped in CASE WHEN:
    // COUNT(*), DISTINCT args, and compound expressions like SUM(a)+SUM(b)
    // (AggRe's greedy group swallows the middle) would all emit invalid SQL,
    // so they fall through to the unmerged group instead (ADVICE r2).
    def caseableArg(arg: String): Boolean = {
      val t = arg.trim
      var depth = 0
      val balanced = t.forall { ch =>
        if (ch == '(') depth += 1
        else if (ch == ')') depth -= 1
        depth >= 0
      } && depth == 0
      t != "*" && !t.matches("(?is)^distinct\\b.*") && balanced
    }
    def caseable(p: Pass): Boolean =
      p.where.isDefined && p.groupBy.nonEmpty &&
        p.select.forall { case (a, e) =>
          p.groupBy.contains(e) || (e.trim match {
            case AggRe(_, arg) => caseableArg(arg)
            case _ => false
          })
        }
    val byWhereShape = selMerged.groupBy(p => (p.from, p.joins, p.groupBy, p.select))
    val whereMerged = byWhereShape.toSeq.sortBy(g => selMerged.indexWhere(_.name == g._2.head.name)).flatMap {
      case (_, Seq(only)) => Seq(only)
      case (_, group) if group.forall(caseable) =>
        val keys = group.head.groupBy
        val mergedSelect =
          group.head.select.filter { case (_, e) => keys.contains(e) } ++
            group.flatMap { p =>
              p.select.collect { case (a, AggRe(f, arg)) =>
                s"${p.name}__$a" ->
                  s"$f(CASE WHEN ${p.where.get} THEN $arg END)"
              } :+ (s"${p.name}__n" ->
                s"COUNT(CASE WHEN ${p.where.get} THEN 1 END)")
            }
        val merged = group.head.copy(
          name = group.map(_.name).mkString("_"),
          where = None, select = mergedSelect)
        aliases ++= group.map { p =>
          val cols = p.select.map {
            case (a, e) if keys.contains(e) => s"`$a`"
            case (a, _) => s"`${p.name}__$a` AS `$a`"
          }.mkString(", ")
          p.name -> (s"SELECT $cols FROM ${merged.name} " +
            s"WHERE `${p.name}__n` > 0")
        }
        Seq(merged)
      case (_, group) => group
    }

    Optimized(whereMerged, aliases, passes.size)
  }

  /** Execute an optimized plan: register each pass (and alias views) in
    * order, return the final pass's frame. `tempTableMode` caches each pass
    * (the >20-pass fallback); derived-table mode composes lazily.
    */
  def execute(spark: SparkSession, opt: Optimized, finalPass: String,
      tempTableMode: Option[Boolean] = None): DataFrame = {
    val materialize = tempTableMode.getOrElse(opt.passCount > 20)
    // passes and alias views reference each other by name; register in
    // dependency order by retrying until a round makes no progress
    var pending: Seq[Either[Pass, (String, String)]] =
      opt.passes.map(Left(_)) ++ opt.views.map(Right(_))
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      pending = pending.flatMap { item =>
        val (name, text) = item.fold(p => (p.name, p.sql), identity)
        try {
          val df = spark.sql(text)
          val out = if (materialize && item.isLeft) df.cache() else df
          out.createOrReplaceTempView(name)
          progressed = true
          None
        } catch { case _: org.apache.spark.sql.AnalysisException => Some(item) }
      }
    }
    require(pending.isEmpty,
      s"unresolvable passes: ${pending.map(_.fold(_.name, _._1))}")
    spark.table(finalPass)
  }

  /** Naive execution (no rewrites) — the correctness baseline. */
  def executeNaive(spark: SparkSession, passes: Seq[Pass],
      finalPass: String): DataFrame = {
    passes.foreach(p => spark.sql(p.sql).createOrReplaceTempView(p.name))
    spark.table(finalPass)
  }
}
