package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-pruned semi-join — the explicit form of the runtime-filter
  * plan (Spark's AQE injects the same pair of expressions when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires; building
  * it explicitly makes the pruning deterministic and available to any
  * join, not just the cost-model's picks).
  *
  * The small side aggregates into a bloom filter (bounded bytes — a
  * plan parameter, not data), which rides into the big side's scan as
  * a FOLDABLE predicate: big rows that cannot match are dropped
  * BEFORE the exchange, so the shuffle carries ~selectivity·|big|
  * instead of |big|. The exact semi-join then removes the bloom's
  * false positives — the result is exactly `LEFT SEMI`, the bloom is
  * pure pruning. At 100 TB with a selective dim filter this is the
  * difference between shuffling the fact table and shuffling the
  * matching slice. */
object BloomJoin {

  /** Exact left-semi join of `big` on `small`, with the big side
    * pre-filtered by a bloom built from the small side's keys.
    * @param expectedItems sizing hint for the filter (false-positive
    *   rate follows Spark's default bits-per-item at this count) */
  def bloomSemiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val agg = Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(smallKey)), expectedItems)
        .toAggregateExpression())
    // driver-collected bounded state (numBits/8 bytes), like IVF
    // centroids / hot-key sets: a DataFrame side-input would re-execute
    // per consumer and could not fold into the scan predicate
    val bloom = small.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(xxhash64(bigKey))))
    big.filter(mightContain).join(small, bigKey === smallKey, "left_semi")
  }
}
