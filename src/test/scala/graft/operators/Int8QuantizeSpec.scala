package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Int8QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("per-tensor absmax scheme: extremes hit ±127, reconstruction error bounded") {
    val embs = Seq(
      (1L, Seq(2.54f, -2.54f, 0.0f, 1.27f)),
      (2L, Seq(0.01f, -0.02f, 0.5f, -1.0f)),
      (3L, Seq(2.54f, -2.54f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = EmbedStats.int8Quantize(embs).orderBy("vec_id").collect()
    val q1 = got(0).getSeq[Int](1)
    assert(q1 === Seq(127, -127, 0, 64)) // scale = 2.54/127 = 0.02
    val scale = 2.54f.toDouble / 127.0
    // every |x - q*scale| <= scale/2 (+clamp slack at the extremes)
    got.foreach { r =>
      assert(r.getDouble(2) <= (scale / 2) * (scale / 2) + 1e-12)
    }
    // round-trip of exact scale multiples (±absmax, 0) is exact at 6dp
    assert(got(2).getDouble(2) === 0.0)
  }

  test("half-up rounding toward +inf for both signs") {
    // scale = 127/127 = 1; +0.5 rounds to 1, -0.5 rounds to 0
    val embs = Seq((1L, Seq(127.0f, 0.5f, -0.5f, -1.5f)))
      .toDF("vec_id", "embedding")
    val q = EmbedStats.int8Quantize(embs).collect().head.getSeq[Int](1)
    assert(q === Seq(127, 1, 0, -1))
  }

  test("mse matches an in-memory left-fold reference") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(2001) - 1000) / 250.0f)))
    val embs = rows.toDF("vec_id", "embedding")
    val absmax = rows.flatMap(_._2).map(x => math.abs(x.toDouble)).max
    val scale = absmax / 127.0
    val expect = rows.map { case (id, v) =>
      val qs = v.map(x => math.max(-127.0, math.min(127.0,
        math.floor(x.toDouble / scale + 0.5))).toInt)
      var acc = 0.0
      v.zip(qs).foreach { case (x, q) =>
        val e = x.toDouble - q * scale; acc += e * e
      }
      id -> math.floor(acc / v.length * 1e6 + 0.5) / 1e6
    }.toMap
    EmbedStats.int8Quantize(embs).collect().foreach { r =>
      assert(r.getDouble(2) === expect(r.getLong(0)), s"vec ${r.getLong(0)}")
    }
  }

  test("all-zero corpus is rejected loudly") {
    val embs = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { EmbedStats.int8Quantize(embs) }
  }

  test("empty corpus is rejected with the diagnostic, not an NPE") {
    val embs = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
      .filter(col("vec_id") < 0L)
    val e = intercept[IllegalArgumentException] {
      EmbedStats.int8Quantize(embs)
    }
    assert(e.getMessage.contains("no quantization scale"))
  }
}
