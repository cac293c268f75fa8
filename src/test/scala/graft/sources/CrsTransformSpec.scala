package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function checks of the map-projection transforms: forward∘
  * inverse identity at survey-grade tolerance, plus a published UTM
  * test point. */
class CrsTransformSpec extends AnyFunSuite {

  private val utm13n =
    """PROJCS["WGS 84 / UTM zone 13N",GEOGCS["WGS 84",DATUM["WGS_1984",
      |SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
      |UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],
      |PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-105],
      |PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],
      |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
      .replace("\n", "")

  test("UTM 13N: known point and forward∘inverse identity") {
    val t = CrsTransform.fromProjcsWkt(utm13n)
    // central meridian at the equator maps to the false easting exactly
    val (x0, y0) = t.forward(-105.0, 0.0)
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
    // a gridMET-domain point (Colorado): round-trip to sub-centimeter
    for ((lon, lat) <- Seq((-104.5, 39.7), (-106.9, 37.1), (-105.0, 41.0))) {
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2")
    }
  }

  test("Mercator and Equirectangular invert their forwards") {
    val merc = CrsTransform.fromProjcsWkt(
      """PROJCS["WGS 84 / Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],
        |PARAMETER["scale_factor",1],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    val eqc = CrsTransform.fromProjcsWkt(
      """PROJCS["World Equidistant Cylindrical",GEOGCS["WGS 84",
        |DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Equirectangular"],PARAMETER["standard_parallel_1",30],
        |PARAMETER["central_meridian",-100],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    for (t <- Seq(merc, eqc); (lon, lat) <- Seq((-100.0, 35.0), (10.0, -20.0))) {
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-8, s"${t.name} lon")
      assert(math.abs(lat2 - lat) < 1e-8, s"${t.name} lat")
    }
  }

  test("TM with nonzero latitude_of_origin (national-grid shape) round-trips") {
    // the OSGB parameter shape: lat0 49, k0 0.9996012717, offset false
    // origin — exercises the m0 (meridional arc at origin) path that
    // UTM's lat0=0 never touches
    val t = CrsTransform.fromProjcsWkt(
      """PROJCS["national grid",GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Transverse_Mercator"],
        |PARAMETER["latitude_of_origin",49],
        |PARAMETER["central_meridian",-2],
        |PARAMETER["scale_factor",0.9996012717],
        |PARAMETER["false_easting",400000],
        |PARAMETER["false_northing",-100000],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    // the true origin maps to the false origin exactly
    val (x0, y0) = t.forward(-2.0, 49.0)
    assert(math.abs(x0 - 400000.0) < 1e-6 && math.abs(y0 + 100000.0) < 1e-6)
    // 1e-7 deg (~1 cm), not 1e-8: at 3.7° from the central meridian the
    // truncated series' round-trip error grows to a few mm — physical
    // accuracy, far inside the bbox contract's tolerance
    for ((lon, lat) <- Seq((-5.7, 50.1), (0.3, 52.7), (-3.1, 58.6))) {
      val (x, y) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-7, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-7, s"lat $lat -> $lat2")
    }
  }

  test("ESRI Mercator: Standard_Parallel_1 implies the scale factor") {
    def wkt(params: String) =
      s"""PROJCS["merc",GEOGCS["WGS 84",DATUM["WGS_1984",
         |SPHEROID["WGS 84",6378137,298.257223563]]],
         |PROJECTION["Mercator"],PARAMETER["central_meridian",0],
         |$params
         |PARAMETER["false_easting",0],PARAMETER["false_northing",0],
         |UNIT["metre",1]]""".stripMargin.replace("\n", "")
    val sp1 = 30.0
    val viaParallel = CrsTransform.fromProjcsWkt(
      wkt(s"""PARAMETER["standard_parallel_1",$sp1],"""))
    val e2 = (1.0 / 298.257223563) * (2 - 1.0 / 298.257223563)
    val k0 = math.cos(math.toRadians(sp1)) /
      math.sqrt(1 - e2 * math.pow(math.sin(math.toRadians(sp1)), 2))
    val viaK0 = CrsTransform.fromProjcsWkt(
      wkt(s"""PARAMETER["scale_factor",$k0],"""))
    for ((lon, lat) <- Seq((-100.0, 35.0), (20.0, -10.0))) {
      val (x1, y1) = viaParallel.forward(lon, lat)
      val (x2, y2) = viaK0.forward(lon, lat)
      assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6)
      val (lon2, lat2) = viaParallel.inverse(x1, y1)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
    // scale at the standard parallel is true: 1 degree of longitude
    // at φ1 spans a·cos(φ1)/√(1−e²sin²φ1)·Δλ meters on the ellipsoid
    val (xa, _) = viaParallel.forward(0.0, sp1)
    val (xb, _) = viaParallel.forward(1.0, sp1)
    val expected = 6378137.0 * k0 * math.toRadians(1.0)
    assert(math.abs((xb - xa) - expected) < 1e-6)
  }

  test("kilometre unit and unsupported projection handling") {
    // a PROJCS in kilometres: forward emits km, inverse consumes km;
    // the false easting PARAMETER is expressed in the PROJCS unit, so
    // the km twin declares 500 (km), not 500000
    val km = CrsTransform.fromProjcsWkt(utm13n
      .replace("""UNIT["metre",1]]""", """UNIT["kilometre",1000]]""")
      .replace("""PARAMETER["false_easting",500000]""",
        """PARAMETER["false_easting",500]"""))
    val m = CrsTransform.fromProjcsWkt(utm13n)
    val (xKm, yKm) = km.forward(-104.5, 39.7)
    val (xM, yM) = m.forward(-104.5, 39.7)
    assert(math.abs(xKm * 1000 - xM) < 1e-6 && math.abs(yKm * 1000 - yM) < 1e-6)
    val (lon2, lat2) = km.inverse(xKm, yKm)
    assert(math.abs(lon2 + 104.5) < 1e-8 && math.abs(lat2 - 39.7) < 1e-8)
    val e = intercept[IllegalArgumentException] {
      CrsTransform.fromProjcsWkt(
        """PROJCS["albers",GEOGCS["NAD83",DATUM["North_American_Datum_1983",
          |SPHEROID["GRS 1980",6378137,298.257222101]]],
          |PROJECTION["Albers_Conic_Equal_Area"],UNIT["metre",1]]"""
          .stripMargin.replace("\n", ""))
    }
    assert(e.getMessage.contains("unsupported PROJECTION"))
    assert(e.getMessage.contains("Transverse_Mercator"))
  }
}
