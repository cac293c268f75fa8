package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** F6/F7/C1/C2/C7 — the finalize layer in isolation. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2021-03-05 00:00:00")

  test("gridmetFinalize: renames, K→°C, humidity quirk, nhru key, units") {
    val agg = Seq((1L, t1, 290.0, 280.0, 2.5, 80.0, 40.0, 3.0))
      .toDF("fid", "time", "tmmx", "tmmn", "pr", "rmax", "rmin", "vs")
    val out = Convert.gridmetFinalize(agg)
    assert(out.columns.toSet ==
      Set("nhru", "time", "tmax", "tmin", "prcp", "rhmax", "rhmin", "ws", "humidity"))
    val r = out.select("tmax", "tmin", "humidity").as[(Double, Double, Double)].head()
    assert(approx(r._1, 16.85) && approx(r._2, 6.85))
    assert(r._3 == 80.0) // rhmin + rhmax/2 quirk, not the average
    assert(out.schema("prcp").metadata.getString("units") == "millimeter")
  }

  test("gridmetFinalize is lenient to missing variables (F6 guard)") {
    // the reference processes whatever variables the dataset carries
    // (`etl.py:728-736`); humidity derives only when its inputs exist
    val agg = Seq((1L, t1, 290.0, 280.0)).toDF("fid", "time", "tmmx", "tmmn")
    val out = Convert.gridmetFinalize(agg)
    assert(out.columns.toSet == Set("nhru", "time", "tmax", "tmin"))
    val r = out.select($"tmax", $"tmin").as[(Double, Double)].head()
    assert(approx(r._1, 16.85) && approx(r._2, 6.85))
  }

  test("cfsv2Finalize keeps sph and skips humidity") {
    val agg = Seq((1L, t1, 290.0, 280.0, 2.5, 0.008))
      .toDF("fid", "time", "tmmx", "tmmn", "pr", "sph")
    val out = Convert.cfsv2Finalize(agg)
    assert(out.columns.toSet == Set("nhru", "time", "tmax", "tmin", "prcp", "sph"))
  }

  test("encodeTimeDays: int64 day offsets from the origin") {
    val df = Seq((1L, java.sql.Date.valueOf("2021-01-08"))).toDF("fid", "time")
    val days = Convert.encodeTimeDays(df, "2021-01-01").select("time").as[Long].head()
    assert(days == 7L)
  }
}
