package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram quantile error is bounded by one bin width") {
    val df = spark.range(10000).select(lit("g").as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val out = Quantiles.histogramQuantiles(df, col("k"), col("v"),
        bins = 64, ps = Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val width = 999.0 / 64
    assert(math.abs(out(0.5) - 500.0) <= width)
    assert(math.abs(out(0.95) - 950.0) <= width)
  }

  test("deterministic under repartitioning; keys are independent") {
    val df = spark.range(5000).select(
      when(col("id") % 2 === 0, "a").otherwise("b").as("k"),
      (col("id") * col("id") % 997).cast("double").as("v"))
    val one = Quantiles.histogramQuantiles(df.coalesce(1), col("k"), col("v"),
      bins = 32, ps = Seq(0.5))
    val many = Quantiles.histogramQuantiles(df.repartition(16), col("k"), col("v"),
      bins = 32, ps = Seq(0.5))
    assert(rows(one) === rows(many))
    assert(one.count() === 2)
  }

  test("single-value keys land in bin 0 and estimate that value-ish") {
    val df = Seq(("k", 7.0), ("k", 7.0), ("k", 7.0)).toDF("k", "v")
    val out = Quantiles.histogramQuantiles(df, col("k"), col("v"),
      bins = 8, ps = Seq(0.5)).collect()
    assert(out.length === 1)
    assert(math.abs(out.head.getDouble(2) - 7.0) < 1.0)
  }
}
