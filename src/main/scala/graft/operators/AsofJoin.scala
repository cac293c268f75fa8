package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the right row with
  * the greatest right-time ≤ the left row's time within the same key —
  * the standard time-series "latest reading at or before t" operator
  * (quotes→trades, sensor→event alignment, feature snapshot lookup).
  * The reference's daily incremental ETL implicitly does this when it
  * aligns each processing day with the latest available remote day
  * (`Gridmet_current.py:24-48` picks the newest date ≤ today); here it
  * is generalized to a keyed relational operator.
  *
  * Scale design: neither a range-explosion join nor a per-key
  * broadcast. Both sides are tagged and UNIONed, then a single shuffle
  * on the key sorts each key's timeline once; the match is
  * `last(right_payload, ignoreNulls)` over the running window — O(n)
  * per key after one exchange, the same plan Flink/kdb use for
  * temporal joins. Right rows order BEFORE left rows at equal
  * timestamps, so "at or before" includes same-instant rights; among
  * equal-time right rows the greatest `tieBreak` wins (last in sort
  * order), making the result deterministic and oracle-exact.
  *
  * Skew note: per-key volume bounds the sort; a single pathological
  * key can be range-bucketed by time (secondary key = t DIV bucket,
  * carrying the last right row of bucket i into bucket i+1) — not
  * needed while keys are users/cells.
  */
object AsofJoin {

  /** @param left      probe side (each row produces exactly one output row)
    * @param right     reference side (rows attach to later left rows)
    * @param keys      equi-join key columns present on both sides
    * @param leftTime  left timestamp column name
    * @param rightTime right timestamp column name
    * @param tieBreak  right column breaking equal-timestamp ties
    *                  (greatest wins); must be on the right side
    * @param rightPrefix prefix applied to right value columns in the
    *                  output (keys and nothing else stay unprefixed)
    * @return left.* plus prefixed right value columns (null when no
    *         right row is at or before the left row's time) */
  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tieBreak: String,
      rightPrefix: String = "r_"): DataFrame = {
    val rightVals = right.columns.filterNot(keys.contains).toSeq
    val leftCols  = left.columns.toSeq
    // output names must be disjoint: a colliding prefixed right column
    // would yield duplicate output columns that only fail later, on the
    // caller's next select-by-name — fail here with the offenders named
    val clash = rightVals.map(c => s"$rightPrefix$c").toSet intersect leftCols.toSet
    require(clash.isEmpty,
      s"asofBackward: prefixed right columns collide with left columns: " +
        s"${clash.mkString(", ")} — choose a different rightPrefix or rename")
    val rPayload  = struct(rightVals.map(col): _*).as("__r")
    val keyCols   = keys.map(col)

    // tieBreak rides in its NATIVE type — a double cast would collapse
    // bigint ids above 2^53 (snowflake-scale) onto one value and null
    // out non-numeric tiebreakers, both silently breaking determinism.
    // Left rows carry a typed null; their relative order at equal
    // (t, side) is irrelevant (each carries its own payload).
    val tieType = right.schema(tieBreak).dataType
    val r2 = right.select(
      keyCols ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreak).as("__tie"), rPayload,
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields.filterNot(f => keys.contains(f.name))))
          .as("__l")): _*)
    val l2 = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(right.select(rPayload).schema.head.dataType).as("__r"),
        struct(left.columns.filterNot(keys.contains).toSeq.map(col): _*)
          .as("__l")): _*)

    // one exchange on the key; right rows sort before left at equal t,
    // greatest tieBreak last so `last()` picks it
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = r2.unionByName(l2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map { c =>
      if (keys.contains(c)) col(c) else col(s"__l.$c").as(c)
    }
    val outRight = rightVals.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    matched.select(outLeft ++ outRight: _*)
  }
}
