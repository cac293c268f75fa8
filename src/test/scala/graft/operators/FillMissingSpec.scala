package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** J2 NN arg-min (ties), F5 split, J3 series overwrite. */
class FillMissingSpec extends SparkSpec {
  import spark.implicits._

  test("nearestMapping picks closest donor; ties break on smaller fid") {
    val miss = Seq((10L, 0.0, 0.0)).toDF("fid", "lat", "lon")
    // donors at distance 5 (two, tie) and 13
    val donors = Seq(
      (3L, 3.0, 4.0), (2L, 4.0, 3.0), (7L, 5.0, 12.0)
    ).toDF("fid", "lat", "lon")
    val m = FillMissing.nearestMapping(miss, donors)
      .as[(Long, Long, Double)].collect()
    assert(m.toSeq == Seq((10L, 2L, 5.0))) // tie at d=5 → smaller donor fid
  }

  test("nearestMapping maps every missing feature") {
    val miss = Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0)).toDF("fid", "lat", "lon")
    val donors = Seq((5L, 1.0, 0.0), (6L, 10.0, 9.0)).toDF("fid", "lat", "lon")
    val m = FillMissing.nearestMapping(miss, donors)
      .select("miss_fid", "fill_fid").as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 5L, 2L -> 6L))
  }

  test("splitMissing uses the earliest timestep only") {
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2021-01-02 00:00:00")
    // fid 1 null at t1 (→ missing) but present at t2; fid 2 opposite
    val ts = Seq(
      (1L, t1, None: Option[Double]), (1L, t2, Some(5.0)),
      (2L, t1, Some(3.0)), (2L, t2, None: Option[Double])
    ).toDF("fid", "time", "tmax")
    val (miss, present) = FillMissing.splitMissing(ts, "tmax")
    assert(miss.as[Long].collect().toSeq == Seq(1L))
    assert(present.as[Long].collect().toSeq == Seq(2L))
  }

  test("fillSeries overwrites the whole missing series with the donor's") {
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2021-01-02 00:00:00")
    val ts = Seq(
      (1L, t1, None: Option[Double], Some(1.1)), (1L, t2, None: Option[Double], Some(9.9)),
      (2L, t1, Some(3.0), Some(2.2)), (2L, t2, Some(4.0), None: Option[Double])
    ).toDF("fid", "time", "a", "b")
    val mapping = Seq((1L, 2L)).toDF("miss_fid", "fill_fid")
    val out = FillMissing.fillSeries(ts, mapping, Seq("a", "b"))
      .orderBy("fid", "time")
      .as[(Long, Timestamp, Option[Double], Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, t1, Some(3.0), Some(2.2)),  // donor values (b: 1.1 overwritten)
      (1L, t2, Some(4.0), None),       // donor's null copies too (aligned assign)
      (2L, t1, Some(3.0), Some(2.2)),  // donor untouched
      (2L, t2, Some(4.0), None)))
  }
}
