package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C1–C5 — derived-physics column expressions (SURVEY.md §2.3).
  *
  * Everything here is pure built-in column arithmetic (codegen'd inside
  * whole-stage codegen) — the reference's numpy/pint vectorized math
  * (`helper.py:175-227`, `etl.py:461-464`, `etl.py:737-747`) needs no
  * UDF on Spark.
  */
object Physics {

  /** C1: Kelvin → Celsius (`etl.py:461-464`, `etl.py:737-739`;
    * output units "degree_Celsius", `gm_header.md:16`). */
  def kelvinToCelsius(t: Column): Column = t - lit(273.15)

  /** C2: gridMET "mean" humidity — replicates the reference's literal
    * Python precedence `rhmin + rhmax / 2.0` = rhmin + (rhmax/2)
    * (`etl.py:740`), a knowingly-preserved quirk: the attrs call it
    * "Daily mean relative humidity" but the code does not average. */
  def gridmetHumidity(rhmin: Column, rhmax: Column): Column =
    rhmin + rhmax / lit(2.0)

  /** C3: barometric pressure (mb) at elevation, isothermal approximation
    * P = 1013.25·exp(−g·elev / (R·T_avg)) with g=9.80665, R=287.05
    * (`helper.py:175-196`). `tAvgK` in Kelvin, `elev` in meters. */
  def pressureAtElevation(elev: Column, tAvgK: Column): Column =
    lit(1013.25) * exp(lit(-9.80665) * elev / (lit(287.05) * tAvgK))

  /** C4: Magnus saturation vapor pressure (mb) from temperature in K
    * (`helper.py:198-202`): e_s = 6.1094·exp(17.625·Tc/(Tc+243.04)). */
  def satVaporPressure(tK: Column): Column = {
    val tc = tK - lit(273.15)
    lit(6.1094) * exp(lit(17.625) * tc / (tc + lit(243.04)))
  }

  /** C5: relative humidity (%) from specific humidity (`helper.py:204-227`):
    * T_avg = (tmmx+tmmn)/2; e = sph·P/0.622; rh = 100·e/e_s(T_avg). */
  def relativeHumidity(sph: Column, tmaxK: Column, tminK: Column, elev: Column): Column = {
    val tAvg = (tmaxK + tminK) / lit(2.0)
    val p = pressureAtElevation(elev, tAvg)
    val e = sph * p / lit(0.622)
    e / satVaporPressure(tAvg) * lit(100.0)
  }
}
