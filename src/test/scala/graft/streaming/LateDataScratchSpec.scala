package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import java.nio.file.Files

// scratch: does FMGWS+EventTimeTimeout filter late rows? (deleted or
// renamed into a real spec once the behavior is pinned)
class LateDataScratchSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("late event behavior under EventTimeTimeout") {
    val base = Files.createTempDirectory("graft-et-late").toString
    val f1 = Seq((1L, ts("2021-06-01 12:00:00"), 1L, 1.0),
                 (9L, ts("2021-06-01 13:00:00"), 2L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    // user 2's only event is 2h LATE relative to the batch-1 watermark
    // (13:00 - 1h = 12:00): end would be 10:30 < wm 12:00
    val f2 = Seq((2L, ts("2021-06-01 10:00:00"), 3L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    Seq(f1, f2).zipWithIndex.foreach { case (df, k) =>
      df.coalesce(1).write.parquet(s"$base/src/part=$k")
      new java.io.File(s"$base/src/part=$k").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1700000000000L + k * 60000L))
    }
    val q = EventPipeline.sessionizeEventTimeStream(spark, s"$base/src",
        gapMinutes = 30, delay = "1 hour", maxFilesPerTrigger = Some(1))
      .format("memory").queryName("et_late").start()
    try {
      val done = q.awaitTermination(120000)
      println(s"TERMINATED=$done exception=${q.exception}")
      println("ROWS=" + spark.table("et_late").collect().toSeq)
    } catch {
      case e: Throwable => println(s"THREW: ${e}")
    } finally q.stop()
  }
}
