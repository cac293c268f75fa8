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
      case "mercator" | "mercator_1sp" | "mercator_2sp" =>
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
      case "mercator_auxiliary_sphere" =>
        // ESRI Web Mercator (EPSG:3857). Despite the WGS84 SPHEROID in
        // the GEOGCS, the projection is defined on a SPHERE of radius a
        // (Auxiliary_Sphere_Type 0) — geographic latitude is used as
        // spherical latitude. Applying the ellipsoidal inverse to
        // spherically-projected y misplaces latitudes by up to ~0.19°
        // (~21 km), so eccentricity is forced to 0 here. With e=0 the
        // Standard_Parallel_1 scale reduces to cos(φ1).
        val k0s = param("scale_factor").getOrElse(
          param("standard_parallel_1").map(sp => math.cos(sp * D2R))
            .getOrElse(1.0))
        mercator(a, 0.0, lam0, k0s, fe, fn, unit)
      case "equirectangular" | "plate_carree" | "equidistant_cylindrical" =>
        val phi1 = param("standard_parallel_1").getOrElse(0.0) * D2R
        equirectangular(a, lam0, phi1, fe, fn, unit)
      case "albers" | "albers_conic_equal_area" | "albers_equal_area" |
          "albers_equal_area_conic" =>
        val phi1 = param("standard_parallel_1").map(_ * D2R).getOrElse(phi0)
        val phi2 = param("standard_parallel_2").map(_ * D2R).getOrElse(phi1)
        albersEqualArea(a, e2, lam0, phi0, phi1, phi2, fe, fn, unit)
      case "lambert_conformal_conic" | "lambert_conformal_conic_2sp" |
          "lambert_conformal_conic_1sp" =>
        // 2SP form carries both parallels (k0 = 1); the 1SP form has
        // only latitude_of_origin + scale_factor — both collapse into
        // the same cone constant computation with φ1 = φ2.
        val phi1 = param("standard_parallel_1").map(_ * D2R).getOrElse(phi0)
        val phi2 = param("standard_parallel_2").map(_ * D2R).getOrElse(phi1)
        lambertConformalConic(a, e2, lam0, phi0, phi1, phi2, k0, fe, fn, unit)
      case "sinusoidal" =>
        sinusoidal(a, e2, lam0, fe, fn, unit)
      case other => throw new IllegalArgumentException(
        s"unsupported PROJECTION '$other' in .prj — supported: " +
          "Transverse_Mercator (UTM and national grids), Mercator, " +
          "Mercator_Auxiliary_Sphere (web), Albers, " +
          "Lambert_Conformal_Conic, Sinusoidal (MODIS), " +
          "Equirectangular/Plate_Carree. Reproject upstream " +
          "(e.g. ogr2ogr -t_srs) for other projections")
    }
  }

  /** Meridional arc length M(φ), Snyder eq. 3-21. */
  private def meridionalArc(a: Double, e2: Double, phi: Double): Double =
    a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
      (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
      (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
      (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

  /** Footpoint latitude from the rectifying latitude μ, Snyder eq. 3-26. */
  private def footpointLatitude(e2: Double, mu: Double): Double = {
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu +
      (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
  }

  /** Ellipsoidal Transverse Mercator, Snyder (1987) eq. 8-9..8-25. */
  private def transverseMercator(
      a: Double, e2: Double, lam0: Double, phi0: Double, k0: Double,
      fe: Double, fn: Double, unit: Double): Transform = {
    val ep2 = e2 / (1.0 - e2)
    def arcM(phi: Double): Double = meridionalArc(a, e2, phi)
    val m0 = arcM(phi0)
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val m = m0 + y / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi1 = footpointLatitude(e2, mu)
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

  /** Ellipsoidal Albers Equal-Area Conic, Snyder eq. 14-1..14-11 with
    * the authalic-latitude series q (eq. 3-12) and its iterative
    * inverse (eq. 3-16). THE standard CONUS analysis projection — and,
    * with `+proj=aea`, the second-most-frequent projected CRS in the
    * reference's own grid catalog (`catalog.parquet` crs column,
    * loaded `etl.py:649-655`). */
  private def albersEqualArea(
      a: Double, e2: Double, lam0: Double, phi0: Double,
      phi1: Double, phi2: Double, fe: Double, fn: Double,
      unit: Double): Transform = {
    val e = math.sqrt(e2)
    def q(phi: Double): Double = {
      val s = math.sin(phi)
      if (e < 1e-12) 2.0 * s
      else (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    val m1 = m(phi1); val m2 = m(phi2)
    val n = if (math.abs(phi1 - phi2) < 1e-12) math.sin(phi1)
      else (m1 * m1 - m2 * m2) / (q(phi2) - q(phi1))
    require(math.abs(n) > 1e-12,
      "degenerate Albers cone: standard parallels are symmetric about the equator")
    val cc = m1 * m1 + n * q(phi1)
    val rho0 = a * math.sqrt(cc - n * q(phi0)) / n
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
      // eq. 14-11: for a south-pointing cone (n < 0) both atan2
      // arguments flip sign
      val theta = if (n >= 0) math.atan2(x, rho0 - y)
        else math.atan2(-x, y - rho0)
      val qv = (cc - rho * rho * n * n / (a * a)) / n
      var phi = math.asin(math.max(-1.0, math.min(1.0, qv / 2)))
      if (e >= 1e-12) {
        var i = 0
        while (i < 15) { // converges in ~3 iterations; fixed count is deterministic
          val s = math.sin(phi)
          val d = 1 - e2 * s * s
          phi = phi + (d * d / (2 * math.cos(phi))) *
            (qv / (1 - e2) - s / d +
              (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
          i += 1
        }
      }
      ((lam0 + theta / n) * R2D, phi * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      val rho = a * math.sqrt(cc - n * q(latD * D2R)) / n
      val theta = n * (lonD * D2R - lam0)
      val x = rho * math.sin(theta)
      val y = rho0 - rho * math.cos(theta)
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Albers", inverse, forward)
  }

  /** Ellipsoidal Lambert Conformal Conic, Snyder eq. 15-1..15-11; the
    * inverse latitude comes from the same conformal iteration as
    * Mercator (eq. 7-9 form). Covers both the 2SP (two standard
    * parallels, k0 = 1 — US State Plane zones) and 1SP
    * (latitude_of_origin + scale_factor) parameter shapes. */
  private def lambertConformalConic(
      a: Double, e2: Double, lam0: Double, phi0: Double,
      phi1: Double, phi2: Double, k0: Double, fe: Double, fn: Double,
      unit: Double): Transform = {
    val e = math.sqrt(e2)
    def tfun(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * s) / (1 + e * s), e / 2)
    }
    def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    val n = if (math.abs(phi1 - phi2) < 1e-12) math.sin(phi1)
      else math.log(m(phi1) / m(phi2)) / math.log(tfun(phi1) / tfun(phi2))
    val bigF = m(phi1) / (n * math.pow(tfun(phi1), n))
    val rho0 = a * k0 * bigF * math.pow(tfun(phi0), n)
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val rhoRaw = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
      val rho = if (n >= 0) rhoRaw else -rhoRaw // eq. 15-11 sign of n
      val theta = if (n >= 0) math.atan2(x, rho0 - y)
        else math.atan2(-x, y - rho0)
      val t = math.pow(rho / (a * k0 * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) { // converges in ~4 iterations; fixed count is deterministic
        val es = e * math.sin(phi)
        phi = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - es) / (1 + es), e / 2))
        i += 1
      }
      ((lam0 + theta / n) * R2D, phi * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      val rho = a * k0 * bigF * math.pow(tfun(latD * D2R), n)
      val theta = n * (lonD * D2R - lam0)
      val x = rho * math.sin(theta)
      val y = rho0 - rho * math.cos(theta)
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Lambert_Conformal_Conic", inverse, forward)
  }

  /** Sinusoidal (ellipsoidal, Snyder eq. 25-1..25-4; reduces exactly to
    * the spherical form when the SPHEROID declares 1/f = 0 — the MODIS
    * grid case, sphere radius 6371007.181 m, which dominates the
    * reference catalog's `+proj=sinu` entries). Equal-area,
    * pseudocylindrical: y is the meridional arc, x scales with the
    * parallel's true length. */
  private def sinusoidal(
      a: Double, e2: Double, lam0: Double,
      fe: Double, fn: Double, unit: Double): Transform = {
    val inverse = (xu: Double, yu: Double) => {
      val x = xu * unit - fe
      val y = yu * unit - fn
      val mu = y / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi = footpointLatitude(e2, mu)
      val s = math.sin(phi)
      val lam =
        if (math.abs(math.cos(phi)) < 1e-12) lam0 // pole: λ indeterminate
        else lam0 + x * math.sqrt(1 - e2 * s * s) / (a * math.cos(phi))
      (lam * R2D, phi * R2D)
    }
    val forward = (lonD: Double, latD: Double) => {
      val phi = latD * D2R
      val s = math.sin(phi)
      val x = a * (lonD * D2R - lam0) * math.cos(phi) / math.sqrt(1 - e2 * s * s)
      val y = meridionalArc(a, e2, phi)
      ((x + fe) / unit, (y + fn) / unit)
    }
    Transform("Sinusoidal", inverse, forward)
  }
}
