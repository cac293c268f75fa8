package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import VecFunctions._

class VecFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("foldDot equals the interpreted left fold bit-for-bit") {
    val df = Seq((Seq(0.1f, 0.2f, 0.3f), Seq(1.5f, -2.5f, 3.5f))).toDF("a", "b")
    val native = df.select(foldDot($"a", $"b")).as[Double].head()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as[Double].head()
    assert(native == hof) // exact equality — same operation order
  }

  test("foldDot on double arrays and norm2") {
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(foldDot($"a", $"b")).as[Double].head() == 25.0)
    assert(df.select(norm2($"a")).as[Double].head() == 5.0)
  }

  test("near-dup pairs: exact scan finds the planted duplicate") {
    import graft.operators.Similarity
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.99f, 0.1f)), (2L, Seq(-1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
    // LSH path returns a subset with identical sims
    val lsh = Similarity.nearDupPairsLsh(vecs, threshold = 0.9, nPlanes = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(pairs))
  }
}
