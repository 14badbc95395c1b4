package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction with a Bloom filter: shrink the BIG side of a join
  * BEFORE its shuffle using a compact membership sketch of the small
  * side's keys.
  *
  * This is the explicit form of what Catalyst's `InjectRuntimeFilter`
  * does automatically when a selective filter sits on the creation side —
  * for plans where the optimizer can't prove selectivity (multi-stage
  * pipelines, pre-aggregated dims, reused sketches), the library exposes
  * the same machinery directly. Both sides use Spark's own codegen'd
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` over
  * `xxhash64`) — no UDF in the hot path, and the probe participates in
  * whole-stage codegen.
  *
  * Scale shape: the sketch is built in one distributed aggregate over the
  * small side (bytes ∝ numBits, independent of big-side size), ships to
  * executors as a literal, and the big side drops non-joining rows at the
  * SCAN, so the join's shuffle carries only (true ∪ false-positive)
  * matches. With fpp ~1% the shuffle volume of a 100-TB fact table joining
  * a 10-M-key dim drops by whatever the join selectivity is — the classic
  * "filter early, shuffle late" move.
  */
object BloomPrune {

  /** Build a Bloom-filter sketch (serialized) of `keys` evaluated on
    * `small`. `expectedItems` sizes the filter (~1.2 bytes/item at 1% fpp
    * default sizing). */
  def keyBloom(small: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)), expectedItems)
    val bytes = small
      .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    require(bytes != null, "bloom build produced no sketch (empty input?)")
    bytes
  }

  /** `might_contain(sketch, xxhash64(key))` as a codegen'd predicate. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Inner equi-join `big ⋈ small` on `key`, with the big side pre-pruned
    * by a Bloom sketch of the small side's keys. Result is EXACTLY the
    * plain join (false positives survive the pre-filter but are dropped by
    * the join itself); only the shuffle volume changes. */
  def prunedJoin(big: DataFrame, small: DataFrame, key: String,
                 expectedItems: Long = 1000000L): DataFrame = {
    val sketch = keyBloom(small, small(key), expectedItems)
    big.filter(mightContain(sketch, big(key))).join(small, key)
  }
}
