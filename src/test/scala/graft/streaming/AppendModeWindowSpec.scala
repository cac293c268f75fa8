package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Append-mode tumbling windows (q110): emit-once on watermark close,
  * through the file sink — the 100× deployment shape for streaming
  * aggregates (Complete mode re-emits the whole aggregate per batch). */
class AppendModeWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append mode emits exactly the watermark-closed windows, incl. the == boundary") {
    // max ts 13:00:00 → final watermark 12:00:00.000 (1 h delay).
    // [10,11): closed. [11,12): end == watermark — Spark's eviction
    // predicate is window.end <= watermark, so it EMITS (pinned here;
    // the q110 oracle encodes the same <=). [13,14): open, never emits.
    val ev = Seq(
      (1L, ts("2021-01-01 10:00:00"), 1L, 1.0, "view"),
      (1L, ts("2021-01-01 10:20:00"), 2L, 2.0, "view"),
      (1L, ts("2021-01-01 11:15:00"), 3L, 4.0, "click"),
      (1L, ts("2021-01-01 13:00:00"), 4L, 8.0, "view")
    ).toDF("user_id", "ts", "event_id", "value", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft-append").toString
    ev.write.mode("overwrite").parquet(dir)
    val sink = java.nio.file.Files.createTempDirectory("graft-append-sink")
    val q = EventPipeline.tumblingCountsStreamAppend(spark, dir)
      .format("parquet").option("path", sink.resolve("out").toString)
      .option("checkpointLocation", sink.resolve("ckpt").toString)
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(sink.resolve("out").toString)

    // only watermark-closed windows came out (the open one is absent)
    assert(rows(streamed.select("hour_start", "event_type", "n_events")) ==
      Set(Seq[Any](ts("2021-01-01 10:00:00"), "view", 2L),
        Seq[Any](ts("2021-01-01 11:00:00"), "click", 1L)))

    // and the batch oracle predicate reproduces the emitted set exactly:
    // wm_us = floor(max_us/1000)*1000 - 1h; emit iff end_us <= wm_us
    val wmUs = ev.agg((floor(unix_micros(max(col("ts"))) / 1000) * 1000
      - 3600L * 1000000L).as("wm")).as[Long].head()
    val batch = EventPipeline.tumblingCounts(ev)
      .filter(unix_micros(col("hour_start")) + 3600L * 1000000L <= wmUs)
    assert(rows(streamed) == rows(batch))
  }
}
