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

  test("pcaProject finds a planted dominant axis; deterministic") {
    val rnd = new scala.util.Random(5)
    val dim = 6
    // variance overwhelmingly along axis 2, small noise elsewhere
    val data = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      Array.tabulate(dim)(d =>
        (if (d == 2) t * 5.0 else 0.0) + rnd.nextDouble() * 0.1)
    }
    val df = data.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    val out = EmbedStats.pcaProject(df, col("vec_id"), col("embedding"), dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 200)
    // pc1 must order the corpus along axis 2 (up to a global sign):
    // correlation of pc1 with the planted coordinate is ~±1
    val xs = (0 until 200).map(i => data(i)(2))
    val ys = (0 until 200).map(i => out(i.toLong))
    val mx = xs.sum / 200; val my = ys.sum / 200
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val corr = cov / math.sqrt(
      xs.map(a => (a - mx) * (a - mx)).sum * ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(corr) > 0.999, s"corr=$corr")
    // deterministic across invocations
    val again = EmbedStats.pcaProject(df, col("vec_id"), col("embedding"), dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === out)
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
