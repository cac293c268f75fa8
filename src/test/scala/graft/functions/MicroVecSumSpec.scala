package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.MicroVecSum.micro_vec_sum

class MicroVecSumSpec extends SparkSpec {
  import spark.implicits._

  test("micro_vec_sum equals the decimal-sum policy element-wise") {
    val rows = Seq(
      Seq(0.5, -1.25, 3.000001),
      Seq(0.25, 2.0, -0.000001),
      Seq(-0.75, 0.5, 1.0))
    val df = rows.map(Tuple1(_)).toDF("v")
    val fast = df.agg(micro_vec_sum(col("v"), 3)).as[Seq[Double]].collect().head
    val expected = (0 until 3).map(i =>
      rows.map(r => BigDecimal(r(i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    assert(fast === expected)
    assert(fast === Seq(0.0, 1.25, 4.0))
  }

  test("micro_vec_sum skips NULL rows, rejects short rows, fails on overflow") {
    val withNull = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v")
    assert(withNull.agg(micro_vec_sum(col("v"), 2))
      .as[Seq[Double]].collect().head === Seq(4.0, 6.0))
    // a row shorter than len must fail loudly, not zero-pad
    val short = Seq(Seq(1.0, 2.0), Seq(5.0)).toDF("v")
    val e = intercept[Exception] {
      short.agg(micro_vec_sum(col("v"), 2)).collect()
    }
    assert(e.getMessage != null)
    // exceeding the exact-double micro range fails fast (2^53 micros)
    val big = Seq(Seq(9.1e9), Seq(9.1e9)).toDF("v") // 2×9.1e15 micros > 2^53
    val o = intercept[Exception] {
      big.agg(micro_vec_sum(col("v"), 1)).collect()
    }
    assert(o.getMessage != null)
  }

  test("micro_vec_sum rejects NULL elements instead of zero-padding") {
    val withNullElem = Seq(Seq[Option[Double]](Some(1.0), None))
      .toDF("v")
    val e = intercept[Exception] {
      withNullElem.agg(micro_vec_sum(col("v"), 2)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("NULL element"))
  }

  test("upper_tri_products rejects NULL elements instead of zero-padding") {
    import graft.functions.UpperTriProducts.upper_tri_products
    val withNullElem = Seq(Seq[Option[Double]](Some(1.0), None))
      .toDF("v")
    val e = intercept[Exception] {
      withNullElem.select(upper_tri_products(col("v"), 2)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("NULL element"))
    // non-null input is unaffected
    val ok = Seq(Seq(2.0, 3.0)).toDF("v")
      .select(upper_tri_products(col("v"), 2)).as[Seq[Double]].collect().head
    assert(ok === Seq(4.0, 6.0, 9.0))
  }
}
