package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.HllDistinct.hll_distinct
import graft.functions.PortableHash.portable_hash

class HllDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Int, parts: Int): Double =
    spark.range(n).repartition(parts)
      .select(portable_hash(concat(lit("v_"), col("id"))).as("h"))
      .agg(hll_distinct(col("h")))
      .collect().head.getDouble(0)

  test("estimate lands inside the expected HLL error envelope") {
    // σ ≈ 1.04/√64 = 13%; assert a generous 3σ band
    for (n <- Seq(500, 5000, 50000)) {
      val est = estimate(n, 8)
      assert(math.abs(est - n) / n < 0.4, s"n=$n est=$est")
    }
  }

  test("result is identical under any partitioning (merge-invariant)") {
    val a = estimate(20000, 1)
    val b = estimate(20000, 32)
    assert(a === b)
  }

  test("small cardinalities take the linear-counting branch exactly") {
    val est = estimate(10, 4)
    // 10 distinct values: registers ≈ 10 non-zero, est = 64·ln(64/zeros)
    assert(est > 5 && est < 20)
    // duplicated input changes nothing — registers saturate by max
    val dup = spark.range(10).select(explode(array(lit(1), lit(2), lit(3))), col("id"))
      .select(portable_hash(concat(lit("v_"), col("id"))).as("h"))
      .agg(hll_distinct(col("h"))).collect().head.getDouble(0)
    assert(dup === est)
  }

  test("SQL registration: hll_distinct callable from spark.sql") {
    graft.GraftFunctions.register(spark)
    spark.range(100)
      .select(portable_hash(concat(lit("v_"), col("id"))).as("h"))
      .createOrReplaceTempView("hll_in")
    val viaSql = spark.sql("SELECT hll_distinct(h) FROM hll_in")
      .collect().head.getDouble(0)
    assert(viaSql === estimate(100, 1))
  }
}
