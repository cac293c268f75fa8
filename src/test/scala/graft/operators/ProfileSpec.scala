package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact small-cardinality ndv, native min/max") {
    val d = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 10.0), (2L, "b", 2.5), (3L, null, null),
      (2L, "a", 100.0) // dup id, dup label
    ).toDF("id", "label", "v")
    val out = Profile.profile(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out.keySet === Set("id", "label", "v"))
    assert(out("id") === ((4L, 0L, 3.0, "1", "3")))
    assert(out("label") === ((4L, 1L, 2.0, "a", "b")))
    // native DOUBLE ordering: 2.5 < 10.0 < 100.0 (string order would
    // put "10.0" < "2.5")
    val v = out("v")
    assert(v._2 === 1L && v._4 === "2.5" && v._5 === "100.0")
  }

  test("profile runs as ONE aggregate job — no per-column expands") {
    val d = (1L to 50L).map(i => (i, s"s$i", i * 1.5)).toDF("a", "b", "c")
    val plan = Profile.profile(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan) // count-distinct would Expand
  }

  test("300-column table: batched aggregates, values identical to 1-batch") {
    // plan-width guard: 4 aggregate expressions per column would blow
    // Janino limits in a single aggregate on wide feature tables, so
    // columns profile in batches of `batchCols` unioned together. The
    // values must not depend on the batching.
    val wide = spark.range(100).select(
      (0 until 300).map(i => (col("id") * 300 + i).as(f"f$i%03d")): _*)
    val out = Profile.profile(wide, batchCols = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))).toMap
    assert(out.size === 300)
    assert(out("f000") === ((100L, 0L, "0", "29700")))
    assert(out("f299") === ((100L, 0L, "299", "29999")))
    // batching is value-invariant: a few columns cross-checked against
    // the tiny-batch form
    val small = Profile.profile(
        wide.select("f000", "f150", "f299"), batchCols = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getString(4), r.getString(5)))).toMap
    for (c <- Seq("f000", "f150", "f299")) {
      val full = Profile.profile(wide, batchCols = 64)
        .filter(col("column") === c).collect().head
      assert(small(c) === ((full.getLong(1), full.getLong(2),
        full.getDouble(3), full.getString(4), full.getString(5))))
    }
  }
}
