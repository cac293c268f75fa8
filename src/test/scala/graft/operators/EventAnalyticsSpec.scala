package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stages must occur strictly in order per user") {
    val ev = Seq(
      // user 1 completes the funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE first view doesn't count; no click after
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: purchase before click → stage stops at click
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // user 4 never views → not in the funnel at all
      (4L, "purchase", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("funnel: first-touch timestamps are the earliest qualifying ones") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 09:00:00")),  // earlier view wins
      (1L, "click", ts("2024-01-01 09:30:00")), // after first view ✓
      (1L, "click", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.funnel(ev, Seq("view", "click", "purchase")).collect().head
    assert(r.getTimestamp(1) === ts("2024-01-01 09:00:00"))
    assert(r.getTimestamp(2) === ts("2024-01-01 09:30:00"))
    assert(r.isNullAt(3) && r.getInt(4) === 2)
  }

  test("equal timestamps do not satisfy strictly-after") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.funnel(ev, Seq("view", "click", "purchase")).collect().head
    assert(r.isNullAt(2) && r.getInt(4) === 1)
  }

  test("OHLC bars: open/close by time order, equal-ts ties by id") {
    val ev = Seq(
      (1L, "m", ts("2024-01-01 09:00:00"), 10.0),
      (2L, "m", ts("2024-01-01 12:00:00"), 99.0),
      (3L, "m", ts("2024-01-01 17:00:00"), 5.0),
      (4L, "m", ts("2024-01-01 17:00:00"), 7.0), // same ts, higher id → close
      (5L, "m", ts("2024-01-02 10:00:00"), 42.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventAnalytics.ohlcBars(ev)
      .collect().map(r => r.getDate(1).toString ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(out("2024-01-01") === ((10.0, 99.0, 5.0, 7.0, 4L)))
    assert(out("2024-01-02") === ((42.0, 42.0, 42.0, 42.0, 1L)))
  }
}
