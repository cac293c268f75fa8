package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val stream = (
    Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++ (1 to 30).map(i => s"cold$i")
  ).zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")

  test("CMS estimate is never below the exact count") {
    val out = Sketches.cmsHeavyHitters(stream, col("key"),
      depth = 4, width = 8, minCount = 1)
    assert(out.filter(col("est_count") < col("exact_count")).isEmpty)
  }

  test("CMS with a wide sketch is exact; threshold filters") {
    // width 1024 over 32 distinct keys: collisions across all 4 rows
    // are overwhelmingly unlikely → estimates equal exact counts
    val out = Sketches.cmsHeavyHitters(stream, col("key"),
      depth = 4, width = 1024, minCount = 20)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("hot" -> ((50L, 50L)), "warm" -> ((20L, 20L))))
  }

  test("sketch table is depth×width-bounded") {
    val sk = Sketches.cmsSketch(stream, col("key"), depth = 4, width = 8)
    assert(sk.count() <= 4L * 8L)
    // per-row totals each equal the stream size
    val totals = sk.groupBy("r").agg(sum("c").as("t"))
      .select("t").as[Long].collect().toSet
    assert(totals === Set(100L))
  }
}
