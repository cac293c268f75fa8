package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("gramCov equals the driver-side brute force; ragged rows excluded") {
    val rnd = new scala.util.Random(3)
    val dim = 4
    val data = (0 until 50).map(_ => Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val df = (data.map(v => Tuple1(v.toSeq)) :+ Tuple1(Seq(1.0, 2.0))) // ragged
      .toDF("embedding")
    val out = EmbedStats.gramCov(df, col("embedding"), dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out.size === dim * (dim + 1) / 2)
    val n = data.length.toDouble
    for (i <- 0 until dim; j <- i until dim) {
      val gram = data.map(v => BigDecimal(r6(v(i) * v(j)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val si = data.map(v => BigDecimal(r6(v(i)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val sj = data.map(v => BigDecimal(r6(v(j)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (g, c) = out((i, j))
      assert(g === gram, s"gram($i,$j)")
      assert(c === r6(gram / n - (si / n) * (sj / n)), s"cov($i,$j)")
    }
    // diagonal gram is a sum of squares → non-negative
    assert((0 until dim).forall(i => out((i, i))._1 >= 0.0))
  }

  test("gramCov is partitioning-invariant (order-free decimal sums)") {
    val rnd = new scala.util.Random(9)
    val data = (0 until 40).map(_ => Tuple1(Seq.fill(8)(rnd.nextDouble())))
    val one = EmbedStats.gramCov(data.toDF("embedding").coalesce(1),
      col("embedding"), 8).collect().map(_.toSeq).toSet
    val many = EmbedStats.gramCov(data.toDF("embedding").repartition(13),
      col("embedding"), 8).collect().map(_.toSeq).toSet
    assert(one === many)
  }
}
