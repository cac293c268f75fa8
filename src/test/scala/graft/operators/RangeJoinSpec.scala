package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.Instant

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = Timestamp.from(Instant.ofEpochSecond(s))

  test("matches the naive |dt|<=r join, boundaries inclusive, no dup pairs") {
    val rnd = new scala.util.Random(11)
    val left = (1L to 80L).map(i => (i, ts(rnd.nextInt(4000).toLong)))
      .toDF("lid", "lts")
    val right = (1L to 200L).map(i => (i, ts(rnd.nextInt(4000).toLong), i * 0.5))
      .toDF("rid", "rts", "v")
    val r = 300L * 1000000 // ±300 s in µs
    val got = RangeJoin.proximityJoin(left, right, "lts", "rts", r)
      .select($"lid", $"r_rid".as("rid"))
    val want = left.join(right,
        abs(unix_micros($"rts") - unix_micros($"lts")) <= r)
      .select($"lid", $"rid")
    assert(rows(got) === rows(want))
    assert(got.count() === got.distinct().count()) // exactly-once emission
    // exact boundary: dt == r must be included
    val lb = Seq((1L, ts(1000))).toDF("lid", "lts")
    val rb = Seq((9L, ts(1300), 0.0), (10L, ts(1301), 0.0)).toDF("rid", "rts", "v")
    val edge = RangeJoin.proximityJoin(lb, rb, "lts", "rts", r)
    assert(edge.select($"r_rid").as[Long].collect().toSet === Set(9L))
  }

  test("plan: bucketed equi-join, no nested loop / cartesian") {
    val left = Seq((1L, ts(0))).toDF("lid", "lts")
    val right = Seq((1L, ts(10), 1.0)).toDF("rid", "rts", "v")
    val plan = RangeJoin.proximityJoin(left, right, "lts", "rts", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("containment join == naive inequality join; exactly-once; half-open") {
    // random points vs variable-width OVERLAPPING intervals, bin width
    // deliberately smaller than some spans and larger than others
    val points = (1L to 300L).map(i => (i, (i * 37 % 101).toDouble / 2.0))
      .toDF("pid", "v")
    val ivs = (1L to 40L).map { k =>
      val lo = (k * 13 % 47).toDouble
      (k, lo, lo + (k % 7).toDouble + 0.5)
    }.toDF("k", "lo", "hi")
    val got = RangeJoin.containmentJoin(points, ivs, "v", "lo", "hi",
        binWidth = 3.0)
      .select($"pid", $"i_k".as("k"))
    val want = points.join(ivs, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"k")
    assert(rows(got) === rows(want))
    assert(got.count() === got.distinct().count()) // exactly-once emission
    // half-open semantics: v == hi excluded, v == lo included
    val p = Seq((1L, 5.0), (2L, 10.0)).toDF("pid", "v")
    val iv = Seq((1L, 5.0, 10.0)).toDF("k", "lo", "hi")
    val edge = RangeJoin.containmentJoin(p, iv, "v", "lo", "hi", 2.0)
    assert(edge.select($"pid").as[Long].collect().toSet === Set(1L))
  }

  test("containment plan: equi-join on the bin, no nested loop") {
    val p = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((1L, 0.0, 10.0)).toDF("k", "lo", "hi")
    val plan = RangeJoin.containmentJoin(p, iv, "v", "lo", "hi", 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
