package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via bloom filter — the MPP join-reduction move: build
  * a compact membership filter from the (post-predicate) build side and
  * apply it to the probe side's SCAN, so rows that cannot join never enter
  * the shuffle. Spark's own InjectRuntimeFilter does exactly this when its
  * thresholds and pattern checks line up; this helper forces the reduction
  * for shapes the optimizer declines (multi-step derived build sides,
  * pre-aggregated probes) using the SAME engine machinery
  * (BloomFilterAggregate / BloomFilterMightContain over xxhash64 — codegen,
  * mergeable, order-independent).
  *
  * The filter itself is driver-materialized and inlined as a literal — the
  * DataFrame analog of the optimizer's scalar-subquery bloom: the driver
  * holds only the bit array (numBits/8 bytes, default 8 bits per expected
  * item ≈ 3% false positives), never data rows. False positives are safe
  * by construction: the join that follows re-checks equality exactly.
  */
object BloomReduce {

  /** Build the bloom bit-array from `key` over `df` (one aggregate action;
    * map-side partials OR together).
    */
  def bloomOf(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = ColumnBridge.column(BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(expectedItems * 8L), 0, 0)
      .toAggregateExpression())
    df.agg(agg.as("bf")).collect()(0).getAs[Array[Byte]](0)
  }

  /** Membership predicate for the probe side: pushes to the scan like any
    * deterministic filter.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))
}
