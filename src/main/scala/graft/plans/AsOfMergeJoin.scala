package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a WHOLE-OPERATOR engine extension — the full custom-plan
  * ladder (SURVEY.md §7.3 option c): a logical node, a planner strategy,
  * and a physical operator with its own distribution/ordering contract and
  * a per-partition merge. [[graft.operators.AsOfJoin.latestPrior]] already
  * expresses the same semantics by composition (union + one window pass);
  * this operator exists for the regime where the composition's costs bite:
  * the union materializes BOTH sides into one padded row shape (every left
  * row carries a null right-struct slot and vice versa) and the window
  * machinery buffers frames, where the merge join streams each side
  * unmodified and keeps O(1) state per key group.
  *
  * Physical contract — the planner does the heavy lifting declaratively:
  *  - requiredChildDistribution: ClusteredDistribution on the join keys for
  *    both children → EnsureRequirements inserts compatible hash exchanges
  *    (or none, when a child is already bucketed/partitioned on the keys —
  *    the collocated-join path Ctas bucketing enables);
  *  - requiredChildOrdering: (keys…, time) ascending on both sides →
  *    EnsureRequirements inserts per-partition sorts, which AQE/reused
  *    exchanges optimize like any sort-merge join's.
  *  - doExecute: zipPartitions merge — for each left row in (key, time)
  *    order, the right cursor advances monotonically; the last right row
  *    with equal keys and rightTime ≤ leftTime is the (inclusive) match.
  *    One linear pass, no candidate-pair blowup, no per-row range probe.
  *
  * Determinism: among right rows with equal (keys, time) the one latest in
  * the child sort order wins, and `rightTies` extends that sort order so
  * equal-time ties resolve to the tiebreak-max row — the window
  * formulation's `tieBreak` contract, enforced by requiredChildOrdering
  * instead of struct-packing.
  */
object AsOfMergeJoin {

  /** Logical as-of join node: left columns plus nullable right columns.
    * `rightTies` extends the right child's sort order past the time column
    * so that "last right row wins" is a deterministic total order among
    * equal-time matches (the window formulation's `tieBreak` contract).
    */
  final case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      rightTies: Seq[Expression],
      toleranceMicros: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Plans the logical node into the physical merge join. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, ties, tol) =>
        AsOfMergeJoinExec(lk, rk, lt, rt, ties, tol,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Register the strategy on a live session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(Strategy))
      spark.experimental.extraStrategies = cur :+ Strategy
  }

  /** Latest-prior as-of join through the physical operator, with the same
    * output contract as [[graft.operators.AsOfJoin.latestPrior]]: every
    * left column, then `prior_<payload>…` and `prior_<rightTime>` (null
    * when no prior right row exists). The right side is re-aliased before
    * the node is built — fresh expression ids, so joining a table to
    * itself (the common "latest prior event" shape) never trips attribute
    * deduplication.
    */
  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    def timeCol(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        case _ => col(c).cast(LongType)
      }
    val l2 = left.withColumn("__asof_lt", timeCol(left, leftTime))
    // fresh ids + a stable projection: keys, payload, ties, time
    val tieExtra = tieBreak.filterNot(payload.contains).filterNot(keys.contains)
    val rCols = keys ++ payload ++ tieExtra
    val r2 = right.select(rCols.map(c => col(c).as(s"__r_$c")) :+
      timeCol(right, rightTime).as("__asof_rt"): _*)
    val lp = l2.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val node = AsOfJoinNode(lp, rp,
      keys.map(attr(lp, _)), keys.map(k => attr(rp, s"__r_$k")),
      attr(lp, "__asof_lt"), attr(rp, "__asof_rt"),
      tieBreak.map(t => attr(rp, s"__r_$t")), toleranceMicros)
    val raw = org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, node)
    // positional selection — duplicate names are possible pre-rename
    val outCols = raw.columns
    val leftN = left.columns.length
    val base = leftN + 1 + keys.length // skip __asof_lt and the right keys
    val rtBack = right.schema(rightTime).dataType match {
      case TimestampType => timestamp_micros(col("__asof_rt"))
      case dt => col("__asof_rt").cast(dt)
    }
    val sel =
      left.columns.indices.map(i => col(outCols(i)).as(left.columns(i))) ++
        payload.zipWithIndex.map { case (p, i) =>
          col(outCols(base + i)).as(s"prior_$p")
        } :+ rtBack.as(s"prior_$rightTime")
    raw.select(sel: _*)
  }
}

/** Physical streaming merge as-of join (see [[AsOfMergeJoin]]). */
final case class AsOfMergeJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression], leftTime: Expression, rightTime: Expression,
    rightTies: Seq[Expression], toleranceMicros: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // the tie columns extend the right sort past time, making "last right
  // row wins" a deterministic total order among equal-time matches
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+
      SortOrder(rightTime, Ascending)) ++
      rightTies.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "left rows with a prior match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val lTimeEval = BindReferences.bindReference(lt, lOut)
      val rTimeEval = BindReferences.bindReference(rt, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // current right cursor row (copied: sorter iterators reuse buffers)
        private var rCur: InternalRow = _
        private var rCurKey: InternalRow = _
        private var rCurTime: Long = 0L
        // last right row matching the left key group so far
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var lastMatchTime: Long = 0L

        private def advanceRight(): Unit = {
          rCur = null
          while (rCur == null && ri.hasNext) {
            val r = ri.next()
            val tv = rTimeEval.eval(r)
            if (tv != null) {
              rCur = r.copy()
              rCurKey = rKeyProj(rCur).copy()
              rCurTime = tv.asInstanceOf[Long]
            } // null right time: can never be a "latest prior" — skip
          }
        }

        advanceRight()

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lKey = lKeyProj(l)
          val ltv = lTimeEval.eval(l)
          if (ltv == null) {
            // null left time matches nothing
            outRows += 1
            joined(l, nullRight)
          } else {
            val lTimeV = ltv.asInstanceOf[Long]
            var break = false
            while (!break && rCur != null) {
              val cmp = keyOrd.compare(rCurKey, lKey)
              if (cmp < 0) {
                // right key group already passed by the left stream: dead
                advanceRight()
              } else if (cmp == 0 && rCurTime <= lTimeV) {
                lastMatch = rCur
                lastMatchKey = rCurKey
                lastMatchTime = rCurTime
                advanceRight()
              } else {
                break = true
              }
            }
            // merge_asof tolerance: the LATEST prior being too old means
            // every earlier one is too — null, not a further scan-back
            val inWindow = lastMatch != null &&
              keyOrd.compare(lastMatchKey, lKey) == 0 &&
              toleranceMicros.forall(t => lastMatchTime >= lTimeV - t)
            outRows += 1
            if (inWindow) { matchedRows += 1; joined(l, lastMatch) }
            else joined(l, nullRight)
          }
        }
      }
    }
  }
}
