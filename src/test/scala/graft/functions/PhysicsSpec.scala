package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C1–C5 vs closed-form numbers (SURVEY.md §5 strategy 1). */
class PhysicsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("one").select(c.cast("double")).as[Double].head()

  test("kelvin to celsius") {
    assert(eval(Physics.kelvinToCelsius(lit(273.15))) == 0.0)
    assert(approx(eval(Physics.kelvinToCelsius(lit(300.0))), 26.85))
  }

  test("gridmet humidity keeps the reference's literal precedence quirk") {
    // rhmin + rhmax/2, NOT (rhmin+rhmax)/2  (etl.py:740)
    assert(eval(Physics.gridmetHumidity(lit(40.0), lit(80.0))) == 80.0)
  }

  test("pressure at elevation: sea level = 1013.25, decreases with height") {
    assert(eval(Physics.pressureAtElevation(lit(0.0), lit(288.15))) == 1013.25)
    val p1500 = eval(Physics.pressureAtElevation(lit(1500.0), lit(288.15)))
    // 1013.25 * exp(-9.80665*1500/(287.05*288.15)) = 1013.25*exp(-0.177847...)
    assert(approx(p1500, 1013.25 * math.exp(-9.80665 * 1500.0 / (287.05 * 288.15))))
    assert(p1500 < 1013.25 && p1500 > 800)
  }

  test("Magnus saturation vapor pressure at 25C") {
    val es = eval(Physics.satVaporPressure(lit(298.15)))
    // 6.1094 * exp(17.625*25/(25+243.04)) ≈ 31.67 mb
    assert(approx(es, 6.1094 * math.exp(17.625 * 25.0 / (25.0 + 243.04))))
    assert(es > 31 && es < 32)
  }

  test("relative humidity from specific humidity: physical range") {
    // sph=0.010 kg/kg at sea level, tavg=25C → e = .01*1013.25/.622 ≈ 16.29 mb
    // rh = e/e_s*100 ≈ 51.4%
    val rh = eval(Physics.relativeHumidity(lit(0.010), lit(303.15), lit(293.15), lit(0.0)))
    val p = 1013.25 * math.exp(-9.80665 * 0.0 / (287.05 * 298.15))
    val e = 0.010 * p / 0.622
    val es = 6.1094 * math.exp(17.625 * 25.0 / (25.0 + 243.04))
    assert(approx(rh, e / es * 100.0))
  }
}
