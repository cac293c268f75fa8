package graft.sources

/** Map-projection inverse (and forward) transforms for the shapefile
  * CRS contract — TRUE reprojection of a PROJECTED `.prj` into the
  * grid's geographic lon/lat, replacing the previous validate-and-
  * refuse behavior for the projection families that cover nearly all
  * projected shapefiles in the wild (UTM / national Transverse
  * Mercator grids, web and nautical Mercator, Plate Carrée).
  *
  * The reference delegates this to geopandas/pyproj
  * (`etl.py:321-322`, `gdf.to_crs(grid_crs)`); this engine implements
  * the PUBLISHED formulas directly — Snyder, *Map Projections: A
  * Working Manual* (USGS PP 1395, 1987): Transverse Mercator eq.
  * 8-17..8-25 (ellipsoidal series inverse), Mercator eq. 7-9/7-10
  * with the conformal-latitude iteration (eq. 3-1 inverse), and the
  * Equirectangular scaling — the same public-spec-by-hand situation
  * as the CDF-5 writer and the `.shp` parser themselves.
  *
  * Accuracy: the TM series inverse is exact to well under 1e-9 rad
  * (~1 cm) within the usual ±3–6° zone width, far inside the
  * contract's tolerance (the bbox subset math operates on ~4 km grid
  * cells). Datum SHIFTS remain out of scope, as for geographic
  * inputs: only the ellipsoid named by the `.prj`'s SPHEROID is used.
  */
object CrsTransform {

  /** A planar↔geographic transform pair. `inverse` maps projected
    * (x, y) in METERS to (lon, lat) degrees; `forward` the reverse
    * (used by specs to build projected fixtures from geographic
    * twins — keeping the round-trip test honest). */
  final case class Transform(
      name: String,
      inverse: (Double, Double) => (Double, Double),
      forward: (Double, Double) => (Double, Double))

  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  /** Parse a PROJCS WKT (ESRI or OGC flavor) into a [[Transform]].
    * Throws IllegalArgumentException with an actionable message when
    * the projection method is unsupported — the caller surfaces it
    * with the reproject-upstream advice. */
  def fromProjcsWkt(wkt: String): Transform = {
    def num(res: scala.util.matching.Regex): Option[Double] =
      res.findFirstMatchIn(wkt).map(_.group(1).toDouble)
    // ellipsoid: SPHEROID["name", a, 1/f] (ESRI) / ELLIPSOID (WKT2)
    val sph = "(?i)(?:SPHEROID|ELLIPSOID)\\[[^,\\]]+,\\s*([-0-9.eE+]+)\\s*,\\s*([-0-9.eE+]+)"
      .r.findFirstMatchIn(wkt)
      .getOrElse(throw new IllegalArgumentException(
        s"PROJCS .prj has no SPHEROID/ELLIPSOID: ${wkt.take(80)}..."))
    val a = sph.group(1).toDouble
    val invF = sph.group(2).toDouble
    val f = if (invF == 0.0) 0.0 else 1.0 / invF // 0 = sphere
    val e2 = f * (2.0 - f)
    val proj = "(?i)PROJECTION\\[\"([A-Za-z_0-9 ]+)\"\\]".r
      .findFirstMatchIn(wkt).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"PROJCS .prj has no PROJECTION[...]: ${wkt.take(80)}..."))
    def param(names: String*): Option[Double] =
      names.view.flatMap(n =>
        s"(?i)PARAMETER\\[\"$n\"\\s*,\\s*([-0-9.eE+]+)".r
          .findFirstMatchIn(wkt).map(_.group(1).toDouble)).headOption
    // linear unit of the PROJCS: the LAST UNIT[...] in standard WKT
    // order (the GEOGCS's angular UNIT precedes it); degrees-vs-meters
    // misreads are impossible because an angular factor (~0.017) can
    // only appear when the PROJCS carries no linear unit at all, which
    // the require below rejects.
    val units = "(?i)UNIT\\[\"[^\"]*\"\\s*,\\s*([-0-9.eE+]+)".r
      .findAllMatchIn(wkt).map(_.group(1).toDouble).toSeq
    val unit = units.lastOption.getOrElse(1.0)
    require(unit > 0.01,
      s"PROJCS linear unit factor $unit looks angular — malformed .prj?")
    val lam0 = param("central_meridian", "longitude_of_center",
      "Longitude_Of_Origin").getOrElse(0.0) * D2R
    val phi0 = param("latitude_of_origin", "latitude_of_center")
      .getOrElse(0.0) * D2R
    val k0 = param("scale_factor").getOrElse(1.0)
    val fe = param("false_easting").getOrElse(0.0) * unit
    val fn = param("false_northing").getOrElse(0.0) * unit

    proj.toLowerCase.replace(' ', '_') match {
      case "transverse_mercator" =>
        transverseMercator(a, e2, lam0, phi0, k0, fe, fn, unit)
      case "mercator" | "mercator_1sp" | "mercator_2sp" |
          "mercator_auxiliary_sphere" =>
        // ESRI-flavor Mercator declares Standard_Parallel_1 instead of
        // a scale factor: the parallel of true scale implies
        // k0 = cos(φ1)/√(1 − e²·sin²φ1) (Snyder eq. 7-8 ratio).
        // Silently ignoring it would misplace every coordinate by the
        // cos(φ1) factor.
        val k0m = param("scale_factor").getOrElse(
          param("standard_parallel_1") match {
            case Some(sp1d) =>
              val sp1 = sp1d * D2R
              math.cos(sp1) / math.sqrt(1 - e2 * math.sin(sp1) * math.sin(sp1))
            case None => 1.0
          })
        mercator(a, e2, lam0, k0m, fe, fn, unit)
      case "equirectangular" | "plate_carree" | "equidistant_cylindrical" =>
        val phi1 = param("standard_parallel_1").getOrElse(0.0) * D2R
        equirectangular(a, lam0, phi1, fe, fn, unit)
      case other => throw new IllegalArgumentException(
        s"unsupported PROJECTION '$other' in .prj — supported: " +
          "Transverse_Mercator (UTM and national grids), Mercator, " +
          "Equirectangular/Plate_Carree. Reproject upstream " +
          "(e.g. ogr2ogr -t_srs) for other projections")
    }
  }

  /** Ellipsoidal Transverse Mercator, Snyder (1987) eq. 8-9..8-25. */
  private def transverseMercator(
      a: Double, e2: Double, lam0: Double, phi0: Double, k0: Double,
      fe: Double, fn: Double, unit: Double): Transform = {
    val ep2 = e2 / (1.0 - e2)
    // meridional arc M(φ), eq. 3-21
    def arcM(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
        (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
        (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
        (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    val m0 = arcM(phi0)
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val m = m0 + y / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      // footpoint latitude, eq. 3-26
      val phi1 = mu +
        (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = (sin1 / cos1) * (sin1 / cos1)
      val n1 = a / math.sqrt(1 - e2 * sin1 * sin1)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val dd = x / (n1 * k0)
      val phi = phi1 - (n1 * (sin1 / cos1) / r1) * (
        dd * dd / 2 -
          (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(dd, 4) / 24 +
          (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
            math.pow(dd, 6) / 720)
      val lam = lam0 + (dd -
        (1 + 2 * t1 + c1) * dd * dd * dd / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(dd, 5) / 120) / cos1
      (lam * R2D, phi * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      // Snyder eq. 8-9..8-15
      val phi = latD * D2R; val lam = lonD * D2R
      val sinP = math.sin(phi); val cosP = math.cos(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = (sinP / cosP) * (sinP / cosP)
      val c = ep2 * cosP * cosP
      val bigA = (lam - lam0) * cosP
      val m = arcM(phi)
      val x = k0 * n * (bigA +
        (1 - t + c) * math.pow(bigA, 3) / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120)
      val y = k0 * (m - m0 + n * (sinP / cosP) * (
        bigA * bigA / 2 +
          (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24 +
          (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720))
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Transverse_Mercator", inverse, forward)
  }

  /** Ellipsoidal Mercator (1SP), Snyder eq. 7-7/7-8 forward and the
    * eq. 7-9 + 3-1 conformal-latitude iteration inverse. */
  private def mercator(
      a: Double, e2: Double, lam0: Double, k0: Double,
      fe: Double, fn: Double, unit: Double): Transform = {
    val e = math.sqrt(e2)
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val t = math.exp(-y / (a * k0))
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) { // converges in ~4 iterations; fixed count is deterministic
        val es = e * math.sin(phi)
        phi = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - es) / (1 + es), e / 2))
        i += 1
      }
      ((lam0 + x / (a * k0)) * R2D, phi * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      val phi = latD * D2R
      val es = e * math.sin(phi)
      val x = a * k0 * (lonD * D2R - lam0)
      val y = a * k0 * math.log(
        math.tan(math.Pi / 4 + phi / 2) *
          math.pow((1 - es) / (1 + es), e / 2))
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Mercator", inverse, forward)
  }

  /** Spherical Equirectangular / Plate Carrée (Snyder eq. 12-1..12-6):
    * x = a·(λ−λ0)·cosφ1, y = a·φ. */
  private def equirectangular(
      a: Double, lam0: Double, phi1: Double,
      fe: Double, fn: Double, unit: Double): Transform = {
    val cos1 = math.cos(phi1)
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      ((lam0 + x / (a * cos1)) * R2D, (y / a) * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      val x = a * (lonD * D2R - lam0) * cos1
      val y = a * (latD * D2R)
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Equirectangular", inverse, forward)
  }
}
