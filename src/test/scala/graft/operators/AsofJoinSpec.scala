package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.Instant

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = Timestamp.from(Instant.ofEpochSecond(s))

  private lazy val left = Seq(
    (1L, 10L, ts(100), 1.0),  // after r@50 -> match 50
    (1L, 11L, ts(200), 2.0),  // exactly at r@200 -> same-instant match
    (1L, 12L, ts(40), 3.0),   // before any right row -> null
    (2L, 20L, ts(500), 4.0),  // key with no right rows at all -> null
    (3L, 30L, ts(100), 5.0)   // tie: two right rows at t=100
  ).toDF("user_id", "event_id", "ts", "value")

  private lazy val right = Seq(
    (1L, 100L, ts(50), 10.0),
    (1L, 101L, ts(200), 11.0),
    (1L, 102L, ts(300), 12.0), // later than every left row — never matches
    (3L, 300L, ts(100), 13.0),
    (3L, 301L, ts(100), 14.0)  // same instant, greater id — must win the tie
  ).toDF("user_id", "view_id", "view_ts", "view_value")

  private lazy val out = AsofJoin.asofBackward(
    left, right, keys = Seq("user_id"),
    leftTime = "ts", rightTime = "view_ts", tieBreak = "view_id",
    rightPrefix = "").cache()

  test("backward match picks the greatest right time at or before t") {
    val m = out.filter($"event_id" === 10L).collect().head
    assert(m.getAs[Long]("view_id") === 100L)
    val same = out.filter($"event_id" === 11L).collect().head
    assert(same.getAs[Long]("view_id") === 101L) // same-instant right included
  }

  test("left rows with no earlier right row keep nulls, one row per left row") {
    assert(out.count() === left.count())
    val misses = out.filter($"view_id".isNull).select($"event_id")
      .as[Long].collect().toSet
    assert(misses === Set(12L, 20L))
  }

  test("equal right timestamps resolve to the greatest tieBreak") {
    val t = out.filter($"event_id" === 30L).collect().head
    assert(t.getAs[Long]("view_id") === 301L)
    assert(t.getAs[Double]("view_value") === 14.0)
  }

  test("random data: equals the naive join-then-argmax reference") {
    val rnd = new scala.util.Random(23)
    val l = (1L to 300L).map(i =>
      (rnd.nextInt(5).toLong, i, ts(rnd.nextInt(1000).toLong), rnd.nextDouble()))
      .toDF("user_id", "event_id", "ts", "value")
    val r = (1L to 300L).map(i =>
      (rnd.nextInt(5).toLong, 1000L + i, ts(rnd.nextInt(1000).toLong), rnd.nextDouble()))
      .toDF("user_id", "view_id", "view_ts", "view_value")
    val got = AsofJoin.asofBackward(l, r, Seq("user_id"), "ts", "view_ts",
        tieBreak = "view_id", rightPrefix = "")
      .select($"event_id", $"view_id")
    // naive reference: inequality join + per-left argmax on (view_ts, view_id)
    import org.apache.spark.sql.expressions.Window
    val joined = l.join(r, l("user_id") === r("user_id") && r("view_ts") <= l("ts"))
      .select(l("event_id"), r("view_id"), r("view_ts"))
    val w = Window.partitionBy($"event_id")
      .orderBy($"view_ts".desc, $"view_id".desc)
    val best = joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"event_id", $"view_id")
    val want = l.select($"event_id").join(best, Seq("event_id"), "left")
    assert(rows(got) === rows(want))
  }

  test("plan: one exchange on the key, no broadcast and no nested loop") {
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin")) // it's a window, not a join
  }

  test("colliding prefixed right columns are rejected up front") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("k", "t", "r_v")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "y", 1L))
      .toDF("k", "rt", "v", "id")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, r, Seq("k"), "t", "rt", tieBreak = "id")
    }
    assert(ex.getMessage.contains("r_v"))
  }
}
