package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k sample buffer: the k lexicographically-smallest (key, value)
  * pairs seen so far, held as a bounded max-heap so insertion is O(log k)
  * and memory is O(k) regardless of group size.
  */
final class BottomKBuffer(val k: Int) {
  // max-heap on (key, value): the head is the current worst retained pair
  val heap = new java.util.PriorityQueue[(Long, Long)](k + 1,
    (a: (Long, Long), b: (Long, Long)) =>
      if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
      else java.lang.Long.compare(b._2, a._2))

  def add(key: Long, value: Long): Unit = {
    if (heap.size < k) heap.add((key, value))
    else {
      val worst = heap.peek()
      if (key < worst._1 || (key == worst._1 && value < worst._2)) {
        heap.poll(); heap.add((key, value))
      }
    }
  }
}

/** Bottom-k-by-hash sampling as a real partial aggregate — the scale path
  * for deterministic sketches (KMV-style bottom-k is a uniform sample when
  * the key is a hash). A window `row_number() <= k` formulation sorts every
  * group end-to-end; this aggregate keeps a k-bounded heap per group with
  * map-side partials, so a trillion-row group costs one streaming pass and
  * O(k) state — the same partial/final shape as any SUM.
  *
  * Output: the k smallest (key, value) pairs as an ascending
  * `array<struct<h,v>>` — identical content to the window formulation with
  * a (key, value) total order, which is how the spec pins the equivalence.
  */
case class BottomKAgg(keyExpr: Expression, valExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] {

  require(k > 0, "bottom-k needs k > 0")

  override def children: Seq[Expression] = Seq(keyExpr, valExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("h", LongType).add("v", LongType), containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val kv = keyExpr.eval(input)
    val vv = valExpr.eval(input)
    if (kv != null && vv != null) {
      buf.add(kv.asInstanceOf[Long], vv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (h, v) = it.next(); buf.add(h, v) }
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val arr = new Array[(Long, Long)](buf.heap.size)
    var i = 0
    val it = buf.heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, (a: (Long, Long), b: (Long, Long)) =>
      if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
      else java.lang.Long.compare(a._2, b._2))
    new GenericArrayData(arr.map { case (h, v) =>
      InternalRow(h, v): Any })
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val (h, v) = it.next(); out.writeLong(h); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomKAgg =
    copy(keyExpr = c(0), valExpr = c(1))
}
