package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed calendar grid and forward-fill the gaps — the relational
  * form of the reference's fill-missing-days convention (its daily ETL
  * carries the latest available remote day forward when a day is
  * absent, `Gridmet_current.py:24-48`; here per-key and columnar).
  *
  * Scale: one shuffle on the key for the last-per-day aggregate, the
  * spine explode multiplies only the aggregated (key, day-range) rows
  * — never the raw events — and the forward fill is a running
  * `last(ignoreNulls)` window per key over days, i.e. O(days) state on
  * already-aggregated data. Per-key day counts are calendar-bounded,
  * so window partitions cannot skew past (max_day − min_day). */
object Resample {

  /** Daily forward-fill: for each key, the value of the latest event
    * per calendar day (greatest (ts, tieBreak) wins — deterministic),
    * on a complete day spine from the key's first to last active day,
    * gaps carrying the previous observation forward.
    * Returns (key, day, value, observed). */
  def dailyForwardFill(
      df: DataFrame, keyCol: Column, tsCol: Column, valueCol: Column,
      tieBreak: Column): DataFrame = {
    // latest observation per (key, day): row_number over (ts, tie) desc
    // — expressible identically in any engine, no argmax ambiguity
    val w = Window.partitionBy(col("key"), col("day"))
      .orderBy(col("ts").desc, col("tie").desc)
    // lazy localCheckpoint: the spine aggregate AND the fill join both
    // read `daily` — without it the scan + group-limit window runs once
    // per consumer (no cross-branch reuse)
    val daily = df
      .select(keyCol.as("key"), tsCol.as("ts"), valueCol.as("value"),
        tieBreak.as("tie"), tsCol.cast("date").as("day"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("day"), col("value"))
      .localCheckpoint(eager = false)
    // complete day spine per key, from its min to its max active day
    val spine = daily.groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("key"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val ff = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        last(col("value"), ignoreNulls = true).over(ff).as("value"),
        col("value").isNotNull.as("observed"))
  }
}
