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
}
