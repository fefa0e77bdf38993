package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items summary: at most k (item, weight) counters.
  *
  * Invariant (the mergeable-summaries bound): for every item, trueCount −
  * weight ≤ D, where D is the total amount ever subtracted by `shrink`.
  * Since each shrink subtracts its decrement from ≥ k+1 counters (the k
  * survivors-before-drop plus the dropped ones), D ≤ N/(k+1) where N is the
  * total weight fed in — across arbitrary merge trees, because merging sums
  * both sides' counters and both sides' subtraction debts add. Hence every
  * item with trueCount > N/(k+1) still holds a positive counter and is
  * returned: the summary is a SUPERSET of the φ-heavy hitters for any
  * φ > 1/(k+1).
  */
final class FreqBuffer(val k: Int) {
  val counts = new java.util.HashMap[java.lang.Long, Long]()

  def add(item: Long, w: Long): Unit = {
    counts.merge(item, w, (a, b) => a + b)
    if (counts.size > k) shrink()
  }

  /** Reduce to ≤ k counters: subtract the (k+1)-th largest weight from all,
    * drop non-positive. O(size log size) only on overflow.
    */
  private def shrink(): Unit = {
    val vals = new Array[Long](counts.size)
    val it0 = counts.values().iterator()
    var i = 0
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val dec = vals(vals.length - (k + 1)) // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nw = e.getValue - dec
      if (nw <= 0) it.remove() else e.setValue(nw)
    }
  }

  def mergeFrom(other: FreqBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > k) shrink()
  }
}

/** Heavy-hitter CANDIDATE generation as a real partial aggregate: O(k) state
  * per group, map-side combinable — the first pass of the standard two-pass
  * exact heavy-hitter pipeline (candidates here, exact verification as a
  * second counting pass over candidate keys only). A plain GROUP BY item
  * would shuffle one row per DISTINCT item; this shuffles k rows per map
  * partition no matter how many distinct items exist — the only shape that
  * survives a 100 TB column with billions of distinct keys.
  *
  * Returns the surviving items sorted ascending (array<long>). Counts are
  * NOT returned: Misra-Gries weights are lower bounds, and the verification
  * pass recounts exactly.
  */
case class FrequentItemsAgg(itemExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqBuffer] {

  require(k > 0, "frequent-items needs k > 0")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: FreqBuffer): Any = {
    val arr = new Array[Long](buf.counts.size)
    val it = buf.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FreqBuffer(k)
    var i = 0
    // merge-style insert: weights land whole, shrink fires only past k
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FrequentItemsAgg =
    copy(itemExpr = c(0))
}
