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
        """PROJCS["krovak",GEOGCS["S-JTSK",DATUM["S_JTSK",
          |SPHEROID["Bessel 1841",6377397.155,299.1528128]]],
          |PROJECTION["Krovak"],UNIT["metre",1]]"""
          .stripMargin.replace("\n", ""))
    }
    assert(e.getMessage.contains("unsupported PROJECTION"))
    assert(e.getMessage.contains("Transverse_Mercator"))
  }

  test("Web Mercator (Mercator_Auxiliary_Sphere) is spherical despite the WGS84 SPHEROID") {
    // EPSG:3857's defining quirk: geographic WGS84 latitude is used as
    // spherical latitude on a sphere of radius a. Expected values are
    // the closed-form x = a·λ, y = a·ln(tan(π/4 + φ/2)) — computed
    // independently; the ellipsoidal inverse would be ~21 km off in y.
    val t = CrsTransform.fromProjcsWkt(
      """PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Mercator_Auxiliary_Sphere"],
        |PARAMETER["central_meridian",0],PARAMETER["standard_parallel_1",0],
        |PARAMETER["auxiliary_sphere_type",0],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    val (x, y) = t.forward(-77.036560, 38.897957)
    assert(math.abs(x - -8575670.631665466) < 0.01, s"x $x")
    assert(math.abs(y - 4707065.310825879) < 0.01, s"y $y")
    val (lon2, lat2) = t.inverse(-8575670.631665466, 4707065.310825879)
    assert(math.abs(lon2 - -77.036560) < 1e-8 && math.abs(lat2 - 38.897957) < 1e-8)
  }

  test("Albers: Snyder PP1395 p.292 example, true scale at parallels, round-trip") {
    // Clarke 1866, φ1 29.5 / φ2 45.5 / φ0 23 / λ0 −96 — the published
    // numerical example: (−75°, 35°) → x 1885472.7, y 1535925.0
    val t = CrsTransform.fromProjcsWkt(
      """PROJCS["aea test",GEOGCS["NAD27",DATUM["North_American_Datum_1927",
        |SPHEROID["Clarke 1866",6378206.4,294.978698213898]]],
        |PROJECTION["Albers_Conic_Equal_Area"],
        |PARAMETER["standard_parallel_1",29.5],
        |PARAMETER["standard_parallel_2",45.5],
        |PARAMETER["latitude_of_origin",23],PARAMETER["central_meridian",-96],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    val (x, y) = t.forward(-75.0, 35.0)
    // Snyder's tabulated values are rounded to 0.1 m
    assert(math.abs(x - 1885472.7) < 0.1, s"x $x")
    assert(math.abs(y - 1535925.0) < 0.1, s"y $y")
    // scale along each standard parallel is TRUE: a 0.1° arc of the
    // parallel must project to its ellipsoidal length a·cosφ/√(1−e²sin²φ)·Δλ
    val e2 = { val f = 1.0 / 294.978698213898; f * (2 - f) }
    for (sp <- Seq(29.5, 45.5)) {
      val (xa, ya) = t.forward(-96.05, sp)
      val (xb, yb) = t.forward(-95.95, sp)
      val chord = math.hypot(xb - xa, yb - ya)
      val arc = 6378206.4 * math.cos(math.toRadians(sp)) /
        math.sqrt(1 - e2 * math.pow(math.sin(math.toRadians(sp)), 2)) *
        math.toRadians(0.1)
      assert(math.abs(chord - arc) / arc < 1e-6, s"parallel $sp: $chord vs $arc")
    }
    for ((lon, lat) <- Seq((-120.3, 32.7), (-75.0, 35.0), (-96.0, 23.0), (-85.4, 48.1))) {
      val (px, py) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(px, py)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2")
    }
  }

  test("Lambert Conformal Conic: Snyder p.296 example and both parameter shapes") {
    val t = CrsTransform.fromProjcsWkt(
      """PROJCS["lcc test",GEOGCS["NAD27",DATUM["North_American_Datum_1927",
        |SPHEROID["Clarke 1866",6378206.4,294.978698213898]]],
        |PROJECTION["Lambert_Conformal_Conic_2SP"],
        |PARAMETER["standard_parallel_1",33],PARAMETER["standard_parallel_2",45],
        |PARAMETER["latitude_of_origin",23],PARAMETER["central_meridian",-96],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    val (x, y) = t.forward(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.1, s"x $x")
    assert(math.abs(y - 1564649.5) < 0.1, s"y $y")
    for ((lon, lat) <- Seq((-120.3, 32.7), (-75.0, 35.0), (-96.0, 23.0), (-85.4, 48.1))) {
      val (px, py) = t.forward(lon, lat)
      val (lon2, lat2) = t.inverse(px, py)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2")
    }
    // 1SP shape: φ1 = φ2 = φ0 with an explicit scale factor — the
    // cone constant degenerates to sin(φ0) and k0 scales ρ
    val t1sp = CrsTransform.fromProjcsWkt(
      """PROJCS["lcc 1sp",GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Lambert_Conformal_Conic_1SP"],
        |PARAMETER["latitude_of_origin",40],PARAMETER["central_meridian",-100],
        |PARAMETER["scale_factor",0.99],PARAMETER["false_easting",100000],
        |PARAMETER["false_northing",50000],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    val (x0, y0) = t1sp.forward(-100.0, 40.0)
    assert(math.abs(x0 - 100000.0) < 1e-6 && math.abs(y0 - 50000.0) < 1e-6)
    for ((lon, lat) <- Seq((-104.5, 39.7), (-95.2, 42.3))) {
      val (px, py) = t1sp.forward(lon, lat)
      val (lon2, lat2) = t1sp.inverse(px, py)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
  }

  test("Sinusoidal: MODIS sphere values and ellipsoidal round-trip") {
    // the MODIS grid: SPHEROID with 1/f = 0 → a true sphere of radius
    // 6371007.181; closed-form x = R·λ·cosφ, y = R·φ
    val modis = CrsTransform.fromProjcsWkt(
      """PROJCS["MODIS Sinusoidal",GEOGCS["unnamed ellipse",DATUM["unknown",
        |SPHEROID["unnamed",6371007.181,0]]],PROJECTION["Sinusoidal"],
        |PARAMETER["central_meridian",0],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    val (x, y) = modis.forward(-105.0, 39.0)
    assert(math.abs(x - -9073552.485653598) < 0.01, s"x $x")
    assert(math.abs(y - 4336607.02708944) < 0.01, s"y $y")
    val (lon2, lat2) = modis.inverse(x, y)
    assert(math.abs(lon2 + 105.0) < 1e-8 && math.abs(lat2 - 39.0) < 1e-8)
    // ellipsoidal form (WGS84) round-trips through the meridional-arc
    // series + footpoint inverse
    val ell = CrsTransform.fromProjcsWkt(
      """PROJCS["sinu wgs84",GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]]],PROJECTION["Sinusoidal"],
        |PARAMETER["central_meridian",-100],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0],UNIT["metre",1]]""".stripMargin
        .replace("\n", ""))
    for ((lon, lat) <- Seq((-104.5, 39.7), (-80.0, -21.2), (-100.0, 0.0))) {
      val (px, py) = ell.forward(lon, lat)
      val (plon, plat) = ell.inverse(px, py)
      assert(math.abs(plon - lon) < 1e-8, s"lon $lon -> $plon")
      assert(math.abs(plat - lat) < 1e-8, s"lat $lat -> $plat")
    }
  }
}
