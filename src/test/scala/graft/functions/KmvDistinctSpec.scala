package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import KmvDistinct.kmv_distinct
import PortableHash.portable_hash

class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def est(values: Seq[String], k: Int): Double =
    values.toDF("v").select(portable_hash($"v").as("h"))
      .agg(kmv_distinct($"h", k)).as[Double].head()

  test("exact below k (duplicates collapse)") {
    assert(est(Seq("a", "b", "c", "a", "b"), k = 8) == 3.0)
    assert(est(Seq.empty[String] :+ "x", k = 4) == 1.0)
  }

  test("estimate within 25% for n >> k") {
    val n = 5000
    val values = (0 until n).map(i => s"value_$i")
    val e = est(values, k = 128)
    assert(math.abs(e - n) / n < 0.25, s"estimate $e for n=$n")
  }

  test("order-invariant and partition-invariant (mergeable)") {
    val values = (0 until 2000).map(i => s"v$i")
    val a = est(values, 64)
    val b = est(scala.util.Random.shuffle(values), 64)
    val c = values.toDF("v").repartition(7)
      .select(portable_hash($"v").as("h"))
      .agg(kmv_distinct($"h", 64)).as[Double].head()
    assert(a == b && a == c) // k smallest hashes are order-independent
  }

  test("negative pre-hashed inputs (raw xxhash64) don't corrupt the estimate") {
    // floorMod hardening: without it a negative input yields a negative
    // scrambled value that becomes one of the k smallest and drags the
    // estimate toward garbage. With it, raw xxhash64 (full-range Long,
    // half negative) estimates as well as portable_hash.
    val n = 5000
    val values = (0 until n).map(i => s"value_$i")
    val e = values.toDF("v").select(xxhash64($"v").as("h"))
      .agg(kmv_distinct($"h", 128)).as[Double].head()
    assert(math.abs(e - n) / n < 0.25, s"estimate $e for n=$n")
  }

  test("grouped estimates") {
    val df = (0 until 1000).map(i => (i % 2, s"g${i % 2}_v$i")).toDF("g", "v")
    val out = df.select($"g", portable_hash($"v").as("h"))
      .groupBy("g").agg(kmv_distinct($"h", 32).as("e"))
      .as[(Int, Double)].collect().toMap
    out.values.foreach(e => assert(math.abs(e - 500) / 500 < 0.4, out))
  }
}
