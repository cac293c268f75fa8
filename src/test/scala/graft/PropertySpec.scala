package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.Random

/** Property tests (SURVEY.md §5 strategy 2) over seeded random inputs:
  * invariants that must hold for ANY data, not just hand fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{WeightedMean, FillMissing}

  private val rnd = new Random(42)
  private val t0 = Timestamp.valueOf("2021-01-01 00:00:00")

  private def randomCase(nCells: Int, nFeatures: Int, nullFrac: Double) = {
    val cells = (0 until nCells).map(c => (c % 7, c / 7))
    val grid = cells.map { case (i, j) =>
      val v = if (rnd.nextDouble() < nullFrac) None else Some(rnd.nextDouble() * 100 - 50)
      (t0, i, j, v)
    }.toDF("time", "i", "j", "v")
    val weights = (0 until nFeatures).flatMap { f =>
      rnd.shuffle(cells.toList).take(1 + rnd.nextInt(5)).map { case (i, j) =>
        (f.toLong, i, j, 0.05 + rnd.nextDouble())
      }
    }.toDF("fid", "i", "j", "wght")
    (grid, weights)
  }

  test("weighted mean lies within [min, max] of contributing values") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.0)
      val bounds = grid.agg(min("v"), max("v")).as[(Double, Double)].head()
      val out = WeightedMean(grid, weights, Seq("v")).select("v").as[Double].collect()
      out.foreach { v =>
        assert(v >= bounds._1 - 1e-9 && v <= bounds._2 + 1e-9,
          s"$v outside [${bounds._1}, ${bounds._2}]")
      }
    }
  }

  test("masked_mean == mean when no values are missing") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.0)
      val plain = WeightedMean(grid, weights, Seq("v"))
        .select($"fid", $"time", round($"v", 9)).collect().map(_.toSeq).toSet
      val masked = WeightedMean(grid, weights, Seq("v"), masked = true)
        .select($"fid", $"time", round($"v", 9)).collect().map(_.toSeq).toSet
      assert(plain == masked)
    }
  }

  test("preCombine preserves results on random data with nulls") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.3)
      for (masked <- Seq(true, false)) {
        val a = WeightedMean(grid, weights, Seq("v"), masked = masked)
          .select($"fid", $"time", round($"v", 6)).collect().map(_.toSeq).toSet
        val b = WeightedMean(grid, weights, Seq("v"), masked = masked, preCombine = true)
          .select($"fid", $"time", round($"v", 6)).collect().map(_.toSeq).toSet
        assert(a == b, s"masked=$masked")
      }
    }
  }

  test("fill is idempotent: filling an already-filled series changes nothing") {
    val ts = (0 until 60).map { k =>
      val fid = (k % 6).toLong
      val time = new Timestamp(t0.getTime + (k / 6) * 86400000L)
      val v = if (fid == 0) None else Some(rnd.nextDouble() * 10)
      (fid, time, v)
    }.toDF("fid", "time", "v")
    val fids = ts.select("fid").distinct()
    def centroids(df: org.apache.spark.sql.DataFrame) =
      df.select($"fid", $"fid".cast("double").as("lat"), lit(0.0).as("lon"))
    val mapping = FillMissing.nearestMapping(
      centroids(fids.filter($"fid" === 0)), centroids(fids.filter($"fid" =!= 0)))
    val once = FillMissing.fillSeries(ts, mapping, Seq("v"))
    val twice = FillMissing.fillSeries(once, mapping, Seq("v"))
    assert(rows(once) == rows(twice))
    assert(once.filter($"v".isNull).count() == 0)
  }

  test("kelvin→celsius→kelvin roundtrip is exact for representable values") {
    import graft.functions.Physics
    val temps = Seq.fill(50)(200.0 + rnd.nextInt(200)).toDF("k") // integral K
    val back = temps.select((Physics.kelvinToCelsius($"k") + lit(273.15)).as("k2"), $"k")
    assert(back.filter($"k2" =!= $"k").count() == 0)
  }

  test("jaccard is symmetric and within [0,1]; self-jaccard is 1") {
    import graft.functions.TextFunctions
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 10).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("id", "text")
    val sh = docs.select($"id", TextFunctions.shingles($"text", 2).as("sh"))
      .filter(size($"sh") > 0)
    val a = sh.select($"id".as("ai"), $"sh".as("sa"))
    val b = sh.select($"id".as("bi"), $"sh".as("sb"))
    val pairs = a.crossJoin(b)
      .select($"ai", $"bi", TextFunctions.jaccard($"sa", $"sb").as("j"))
      .collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    m.foreach { case ((x, y), j) =>
      assert(j >= 0.0 && j <= 1.0)
      assert(m((y, x)) == j)
      if (x == y) assert(j == 1.0)
    }
  }
}
