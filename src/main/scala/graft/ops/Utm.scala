package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** SURVEY §7.3 hard item 1 — the export CRS → EPSG:4326 reprojection the
  * reference delegates to rasterio/GDAL (`rasterio.warp.transform(src.crs,
  * 'EPSG:4326', …)`, fix_transparency.py:72), scoped to the UTM family the
  * raster exports actually use (north India = zones 42-44N).
  *
  * Pure-Scala transverse Mercator on the WGS84 ellipsoid via the Krüger
  * series (6th-order in the third flattening n) — the same series GDAL/
  * PROJ use for accuracy class <1 mm inside a zone. Exposed as UDFs: the
  * math is branch-heavy scalar code, a poor fit for Column algebra, and a
  * perfect fit for one JVM method call per row (still fully distributed;
  * no per-partition state).
  */
object Utm {

  private val A = 6378137.0               // WGS84 semi-major
  private val F = 1.0 / 298.257223563     // flattening
  private val K0 = 0.9996                 // UTM scale at central meridian
  private val E0 = 500000.0               // false easting
  private val N0_SOUTH = 10000000.0       // false northing, southern zones

  private val n = F / (2.0 - F)
  private val n2 = n * n; private val n3 = n2 * n
  private val n4 = n3 * n; private val n5 = n4 * n; private val n6 = n5 * n
  // rectifying radius
  private val A1 = A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
  // Krüger α (forward) and β (inverse) coefficients, 6th order
  private val alpha = Array(
    n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
    13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
    61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
    49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
    34729 * n5 / 80640 - 3418889 * n6 / 1995840,
    212378941 * n6 / 319334400)
  private val beta = Array(
    n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
    n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
    17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
    4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
    4583 * n5 / 161280 - 108847 * n6 / 3991680,
    20648693 * n6 / 638668800)
  private val e = math.sqrt(F * (2 - F)) // first eccentricity

  def zoneCentralMeridian(zone: Int): Double = (zone - 1) * 6.0 - 180.0 + 3.0

  /** Forward: (lat°, lon°) → (easting, northing) in `zone`. */
  def toUtm(latDeg: Double, lonDeg: Double, zone: Int,
            north: Boolean = true): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - zoneCentralMeridian(zone))
    // conformal latitude
    val t = math.sinh(atanh(math.sin(phi)) - e * atanh(e * math.sin(phi)))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = atanh(math.sin(lam) / math.sqrt(1 + t * t))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    val easting = E0 + K0 * A1 * eta
    val northing = (if (north) 0.0 else N0_SOUTH) + K0 * A1 * xi
    (easting, northing)
  }

  /** Inverse: (easting, northing, zone) → (lat°, lon°). */
  def toLatLon(easting: Double, northing: Double, zone: Int,
               north: Boolean = true): (Double, Double) = {
    val xi = (northing - (if (north) 0.0 else N0_SOUTH)) / (K0 * A1)
    val eta = (easting - E0) / (K0 * A1)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP)) // conformal lat
    // Newton iteration from conformal to geodetic latitude
    var phi = chi
    var i = 0
    while (i < 8) {
      val s = math.sinh(e * atanh(e * math.sin(phi)))
      val phiNew = math.atan(math.tan(chi) * math.sqrt(1 + s * s) +
        s * math.sqrt(1 + math.tan(chi) * math.tan(chi)))
      if (math.abs(phiNew - phi) < 1e-14) { phi = phiNew; i = 8 }
      else { phi = phiNew; i += 1 }
    }
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(phi), zoneCentralMeridian(zone) + math.toDegrees(lam))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** Exact-constant accessors for the DuckDB oracle mirror of [[toLatLon]]
    * (SparkEntry builds the SQL from these so both sides use bit-identical
    * doubles). */
  def oracleConstants: (Double, Array[Double], Double, Double) =
    (K0 * A1, beta, e, E0)

  /** Column UDFs returning struct(lat, lon) / struct(easting, northing). */
  def utmToLatLonUdf(zone: Int, north: Boolean = true) =
    udf((e: Double, n: Double) => toLatLon(e, n, zone, north))

  def latLonToUtmUdf(zone: Int, north: Boolean = true) =
    udf((lat: Double, lon: Double) => toUtm(lat, lon, zone, north))
}
