package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** A3 — exact ensemble median (even/odd counts, nulls). */
class EnsembleStatsSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2021-01-01 00:00:00")

  test("odd member count: middle value") {
    val g = Seq(1.0, 5.0, 3.0).zipWithIndex
      .map { case (v, e) => (t1, e, 0, 0, v) }
      .toDF("time", "ens", "i", "j", "v")
    val out = EnsembleStats.ensembleMedian(g, Seq("v")).select("v").as[Double].head()
    assert(out == 3.0)
  }

  test("even member count: mean of the two middle values (np.median semantics)") {
    val g = Seq(1.0, 2.0, 10.0, 20.0).zipWithIndex
      .map { case (v, e) => (t1, e, 0, 0, v) }
      .toDF("time", "ens", "i", "j", "v")
    val out = EnsembleStats.ensembleMedian(g, Seq("v")).select("v").as[Double].head()
    assert(out == 6.0)
  }

  test("median is per-cell") {
    val g = Seq(
      (t1, 0, 0, 0, 1.0), (t1, 1, 0, 0, 3.0),
      (t1, 0, 1, 1, 100.0), (t1, 1, 1, 1, 300.0)
    ).toDF("time", "ens", "i", "j", "v")
    val out = EnsembleStats.ensembleMedian(g, Seq("v"))
      .orderBy("i").select("v").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 200.0))
  }
}
