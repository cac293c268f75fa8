package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("zscore: exact moments, constant groups yield NULL") {
    val d = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 5.0), ("b", 5L, 5.0) // constant group → σ = 0
    ).toDF("k", "id", "v")
    val out = Normalize.zscore(d, Seq("k"), col("v"))
      .collect().map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // group a: μ=2, σ=sqrt(2/3)
    val sd = math.sqrt(2.0 / 3.0)
    assert(approx(out(1L).get, math.floor(-1.0 / sd * 1e6 + 0.5) / 1e6))
    assert(out(2L).get === 0.0)
    assert(approx(out(3L).get, math.floor(1.0 / sd * 1e6 + 0.5) / 1e6))
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  test("zscore: NULL values are excluded from moments, not counted") {
    // regression: count(*) would see n=3 here, making a CONSTANT group
    // look variable (mu 3.33, var > 0) and emit garbage z-scores
    val d = Seq[(String, Long, java.lang.Double)](
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, null),
      ("b", 4L, 1.0), ("b", 5L, 3.0), ("b", 6L, null))
      .toDF("k", "id", "v")
      .select($"k", $"id", $"v".cast("double").as("v"))
    val out = Normalize.zscore(d, Seq("k"), col("v"))
      .collect().map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty) // constant group stays NULL
    assert(out(3L).isEmpty)                    // null value → null z
    // group b: moments over the two non-null values only (μ=2, σ=1)
    assert(out(4L).get === -1.0 && out(5L).get === 1.0)
    assert(out(6L).isEmpty)
  }

  test("zscore is partitioning-invariant (exact decimal moments)") {
    val d = (1L to 1000L).map(i => ("k", i, (i % 97).toDouble + 0.25))
      .toDF("k", "id", "v")
    val a = Normalize.zscore(d.repartition(1), Seq("k"), col("v"))
      .select("id", "z")
    val b = Normalize.zscore(d.repartition(13), Seq("k"), col("v"))
      .select("id", "z")
    assert(rows(a) === rows(b)) // bit-identical, any partitioning
  }

  test("winsorize: clips to interpolated percentile bounds, NULLs stay NULL") {
    // values 0..10 in one group: p(0.05) over 11 points = (11-1)*0.05
    // = index 0.5 → 0.5; p(0.95) → index 9.5 → 9.5
    val d = ((0 to 10).map(i => (i.toLong, "a", Some(i.toDouble)))
      :+ (99L, "a", Option.empty[Double]))
      .toDF("id", "k", "v")
    val out = Normalize.winsorize(d, Seq("k"), col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(0L) === Some(0.5))   // below lo → clipped up
    assert(out(10L) === Some(9.5))  // above hi → clipped down
    assert(out(5L) === Some(5.0))   // inside → untouched
    assert(out(99L) === None)       // NULL value stays NULL
  }

  test("winsorize: per-key bounds are independent") {
    val d = ((1 to 100).map(i => (i.toLong, "big", i.toDouble))
      ++ Seq((201L, "small", 1.0), (202L, "small", 2.0))).toDF("id", "k", "v")
    val out = Normalize.winsorize(d, Seq("k"), col("v"), pLo = 0.1, pHi = 0.9)
      .filter(col("k") === "small")
      .select("v_clipped").as[Double].collect().sorted
    // small group's own bounds: p10 = 1.1, p90 = 1.9
    assert(out.toSeq === Seq(1.1, 1.9))
  }

  test("robustScale: median/IQR scaling; zero IQR and NULLs yield NULL") {
    // 0..10: median 5, q25 = 2.5, q75 = 7.5 → IQR 5
    val d = ((0 to 10).map(i => (i.toLong, "a", Some(i.toDouble)))
      ++ Seq((50L, "const", Some(3.0)), (51L, "const", Some(3.0)),
        (99L, "a", Option.empty[Double])))
      .toDF("id", "k", "v")
    val out = Normalize.robustScale(d, Seq("k"), col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(0L) === Some(-1.0))  // (0-5)/5
    assert(out(10L) === Some(1.0))  // (10-5)/5
    assert(out(5L) === Some(0.0))
    assert(out(99L) === None)       // NULL value
    assert(out(50L) === None)       // zero IQR → NULL, not ±Inf
  }

  test("percentile-state guard trips on a high-cardinality hot key") {
    // one key, 50k distinct doubles: with the tripwire dialed down the
    // plan must fail fast naming the histogram dial — converting the
    // 100 TB "mystery executor OOM inside an exact-percentile buffer"
    // into an actionable message. Default threshold still completes.
    val d = spark.range(50000).select(col("id"), lit("hot").as("k"),
      (col("id") * 1.000001d).as("v"))
    for ((name, guarded) <- Seq[(String, Long => org.apache.spark.sql.DataFrame)](
        "winsorize" -> (mx =>
          Normalize.winsorize(d, Seq("k"), col("v"), maxDistinctPerKey = mx)),
        "robustScale" -> (mx =>
          Normalize.robustScale(d, Seq("k"), col("v"), maxDistinctPerKey = mx)))) {
      val e = intercept[Exception] { guarded(1000L).collect() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("histogramQuantiles"), s"$name: $msgs")
      assert(guarded(4000000L).count() === 50000L, name)
    }
  }
}
