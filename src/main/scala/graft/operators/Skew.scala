package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handling covers most cases
  * at runtime; these are the explicit forms for when the skew is known
  * ahead of time (a handful of "celebrity" keys holding a large share
  * of the rows — hot shingles, bot users, null-ish defaults).
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (keys…, salt = crc32(rand-free row hash) % buckets) spreading each
    * hot key over `buckets` reducers; stage 2 merges the partials on the
    * real keys. Caller supplies partial and merge aggregate pairs with
    * matching column names — e.g. partial `sum(x) as s, count(1) as c`,
    * merge `sum(s) as s, sum(c) as c`.
    *
    * Salt comes from the row POSITION (`monotonically_increasing_id`),
    * not the row content: a hot key is usually hot because of many
    * identical rows, and a content hash would send them all to ONE salt
    * bucket. Position salting spreads them evenly; the merge stage makes
    * the final result independent of which bucket each row landed in.
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[String], buckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets > 0 && partial.nonEmpty && merge.nonEmpty)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Broadcast-salted join for a skewed LEFT side against a small right
    * side: replicate the (broadcast) right side over `buckets` salt
    * values so the left side's hot keys spread across reducers. For a
    * genuinely broadcastable right side Spark needs no salt at all —
    * this form exists for the middle ground where the join must shuffle
    * (right side too big to broadcast) but hot left keys would pin
    * single reducers. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
