package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Event-stream operators. The reference is strictly batch (SURVEY.md
  * §2.8) but its operational cadence — daily availability probe then
  * incremental ETL of the new day (`Gridmet_current.py:24-48`) — is a
  * micro-batch pattern; these operators express it natively with
  * Structured Streaming, plus the batch-equivalent forms used by the
  * DuckDB oracle (identical results on a static events table).
  */
object EventPipeline {

  /** Tumbling-window aggregate (batch form): events per (hour, type)
    * with count and rounded value sum. Matches the streaming form below
    * on static input. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))

  /** Streaming form of [[tumblingCounts]]: watermark + windowed agg.
    * Returns a writer ready to `.start()`; tested with the memory sink. */
  def tumblingCountsStream(spark: SparkSession, sourceDir: String): DataStreamWriter[Row] = {
    val schema = spark.read.parquet(sourceDir).schema
    val events = spark.readStream.schema(schema).parquet(sourceDir)
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .writeStream.outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
  }

  /** Gap-based sessionization (batch form): a new session starts when
    * the gap to the previous event of the same user exceeds
    * `gapMinutes`. Output: one row per session with start, event count
    * and value sum. Gap comparison in exact microseconds
    * (`unix_micros`) so the oracle (epoch_us) is bit-identical. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("sess_id"), col("session_start"),
        col("n_events"), col("sum_value"))
  }
}
