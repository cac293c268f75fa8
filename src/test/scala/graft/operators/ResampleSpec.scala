package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("daily forward fill: gaps carry the previous observation") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0, 100L),
      (1L, ts("2024-01-01 12:00:00"), 11.0, 101L), // later same day wins
      (1L, ts("2024-01-04 09:00:00"), 14.0, 102L), // 2-day gap before
      (2L, ts("2024-01-02 00:00:00"), 20.0, 103L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Resample.dailyForwardFill(df,
        col("user_id"), col("ts"), col("value"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out((1L, "2024-01-01")) === ((11.0, true)))
    assert(out((1L, "2024-01-02")) === ((11.0, false)))
    assert(out((1L, "2024-01-03")) === ((11.0, false)))
    assert(out((1L, "2024-01-04")) === ((14.0, true)))
    assert(out((2L, "2024-01-02")) === ((20.0, true)))
    assert(out.size === 5) // complete spine per key, nothing more
  }

  test("equal-timestamp observations: greatest tieBreak wins") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Resample.dailyForwardFill(df,
      col("user_id"), col("ts"), col("value"), col("event_id")).collect()
    assert(out.length === 1 && out.head.getDouble(2) === 2.0)
  }
}
