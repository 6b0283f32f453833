package graft.ops

/** EPSG → projection registry — the general form of the reference's
  * "accept any source CRS" reprojection (`rasterio.warp.transform(src.crs,
  * 'EPSG:4326', …)`, fix_transparency.py:72). Each registered code routes
  * to one of the engine's projection cores: geographic pass-through,
  * the Web-Mercator closed form (GeoFns), or the Krüger transverse-
  * Mercator inverse (Utm) parametrized by zone and hemisphere — which
  * covers every WGS84 UTM export GDAL can emit (EPSG:32601-60 north,
  * 32701-60 south). Unregistered codes resolve to None so callers fail
  * loudly instead of mislabeling coordinates.
  */
object Crs {

  sealed trait Projection
  case object Geographic extends Projection    // EPSG:4326, degrees as-is
  case object WebMercator extends Projection   // EPSG:3857, spherical
  final case class UtmZone(zone: Int, north: Boolean) extends Projection
  final case class TransverseMercator(p: Utm.Tmerc) extends Projection
  final case class LambertConic(p: Conic.Lcc) extends Projection
  final case class AlbersConic(p: Conic.Albers) extends Projection
  final case class LaeaAzimuthal(p: Conic.Laea) extends Projection
  final case class PolarStereographic(p: Conic.PolarStereo) extends Projection
  final case class SphericalSinusoidal(p: Conic.Sinusoidal) extends Projection

  /** Registered conic codes — the LCC/Albers products national met/stat
    * agencies actually publish rasters in. All are ETRS89/NAD83-family
    * (≤ ~1-2 m from WGS84, below raster resolution; see Conic scaladoc).
    * Parameters are the EPSG-registry definitions. */
  private val Lambert93 = Conic.Lcc(Ellipsoid.GRS80,
    phi1Deg = 49.0, phi2Deg = 44.0, phi0Deg = 46.5, lam0Deg = 3.0,
    falseE = 700000.0, falseN = 6600000.0)              // EPSG:2154 (France)
  private val CanadaAtlasLcc = Conic.Lcc(Ellipsoid.GRS80,
    phi1Deg = 49.0, phi2Deg = 77.0, phi0Deg = 49.0, lam0Deg = -95.0)
                                                         // EPSG:3978
  private val ConusAlbers = Conic.Albers(Ellipsoid.GRS80,
    phi1Deg = 29.5, phi2Deg = 45.5, phi0Deg = 23.0, lam0Deg = -96.0)
                                                         // EPSG:5070
  private val CaliforniaAlbers = Conic.Albers(Ellipsoid.GRS80,
    phi1Deg = 34.0, phi2Deg = 40.5, phi0Deg = 0.0, lam0Deg = -120.0,
    falseE = 0.0, falseN = -4000000.0)                   // EPSG:3310
  private val EuropeLaea = Conic.Laea(Ellipsoid.GRS80,
    phi0Deg = 52.0, lam0Deg = 10.0,
    falseE = 4321000.0, falseN = 3210000.0)              // EPSG:3035
  /** Polar products (WGS84, standard-parallel form): NSIDC sea-ice
    * north and Antarctic south grids. */
  private val ArcticPs = Conic.PolarStereo(Ellipsoid.WGS84,
    latTsDeg = 70.0, lam0Deg = -45.0)                    // EPSG:3413
  private val AntarcticPs = Conic.PolarStereo(Ellipsoid.WGS84,
    latTsDeg = -71.0, lam0Deg = 0.0)                     // EPSG:3031
  /** The MODIS land grid (HDF-EOS/GCTP sinusoidal on the authalic
    * sphere) — the CRS of MOD09/MCD43-family products. GDAL-converted
    * MODIS GeoTIFFs carry it in the ProjectedCSTypeGeoKey under the
    * ESRI extended range (53008 Sphere_Sinusoidal is the same spherical
    * equation set on the R = 6,371,000 sphere); the exact GCTP radius
    * variant is exposed for direct use. */
  val ModisSinusoidal: Conic.Sinusoidal = Conic.Sinusoidal(6371007.181)
  private val SphereSinu = Conic.Sinusoidal(6371000.0)   // ESRI:53008

  def fromEpsg(code: Int): Option[Projection] = code match {
    case 4326 => Some(Geographic)
    case 3857 => Some(WebMercator)
    case c if c >= 32601 && c <= 32660 => Some(UtmZone(c - 32600, north = true))
    case c if c >= 32701 && c <= 32760 => Some(UtmZone(c - 32700, north = false))
    // national TM grids that are NOT UTM zones: the parameterized
    // Krüger core with per-code (ellipsoid, k0, phi0, lam0, FE, FN)
    case 27700 => Some(TransverseMercator(Utm.Tmerc.BritishNationalGrid))
    case 2193 => Some(TransverseMercator(Utm.Tmerc.Nztm2000))
    case 2154 => Some(LambertConic(Lambert93))
    case 3978 => Some(LambertConic(CanadaAtlasLcc))
    case 5070 => Some(AlbersConic(ConusAlbers))
    case 3310 => Some(AlbersConic(CaliforniaAlbers))
    case 3035 => Some(LaeaAzimuthal(EuropeLaea))
    case 3413 => Some(PolarStereographic(ArcticPs))
    case 3031 => Some(PolarStereographic(AntarcticPs))
    // ESRI extended range, as written by GDAL into ProjectedCSTypeGeoKey
    case 53008 => Some(SphericalSinusoidal(SphereSinu))
    case _ => None
  }

  /** Parse an `EPSG:nnnn` string (the form GeoTiff.parse produces). */
  def fromCrsString(crs: String): Option[Projection] =
    if (crs != null && crs.startsWith("EPSG:"))
      crs.stripPrefix("EPSG:").toIntOption.flatMap(fromEpsg)
    else None

  /** Datum of a registered code, as its Helmert-to-WGS84 parameters.
    * None = the code's datum is WGS84 itself or a WGS84-compatible
    * realization (ETRS89/NAD83/NZGD2000, ≤ ~1-2 m — below raster
    * resolution, same null treatment rasterio applies by default).
    * Some = a genuinely offset legacy datum; [[toLonLat]] output for
    * such codes is NATIVE-datum and needs [[Datum.shiftToWgs84]] —
    * which [[toWgs84LonLat]] composes. Registered: EPSG:27700
    * (OSGB36/Airy 1830, up to ~125 m from WGS84, EPSG:1314 params). */
  def helmertToWgs84(code: Int): Option[(Ellipsoid, Datum.Helmert7)] =
    code match {
      case 27700 => Some((Ellipsoid.Airy1830, Datum.Osgb36ToWgs84))
      case _ => None
    }

  /** Scalar inverse INCLUDING the datum shift: projected (x, y) of a
    * registered EPSG code → WGS84 (lon°, lat°). Identical to
    * [[toLonLat]] for WGS84-family codes; applies the registered
    * Helmert for legacy-datum codes. */
  def toWgs84LonLat(code: Int, x: Double, y: Double)
  : Option[(Double, Double)] =
    fromEpsg(code).map { p =>
      val (lon, lat) = toLonLat(p, x, y)
      helmertToWgs84(code) match {
        case Some((ell, h)) =>
          val (la, lo) = Datum.shiftToWgs84(ell, h, lat, lon)
          (lo, la)
        case None => (lon, lat)
      }
    }

  /** Scalar inverse: projected model (x, y) → (lon°, lat°). Mirrors the
    * column-level math (GeoFns.mercatorToLon/Lat, Utm.toLatLon) exactly. */
  def toLonLat(p: Projection, x: Double, y: Double): (Double, Double) =
    p match {
      case Geographic => (x, y)
      case WebMercator =>
        (x / 6378137.0 * (180.0 / math.Pi),
         (math.atan(math.exp(y / 6378137.0)) * 2.0 - math.Pi / 2.0) *
           (180.0 / math.Pi))
      case UtmZone(zone, north) =>
        val (lat, lon) = Utm.toLatLon(x, y, zone, north)
        (lon, lat)
      case TransverseMercator(p) =>
        val (lat, lon) = p.inverse(x, y)
        (lon, lat)
      case LambertConic(p) => p.inverse(x, y)
      case AlbersConic(p) => p.inverse(x, y)
      case LaeaAzimuthal(p) => p.inverse(x, y)
      case PolarStereographic(p) => p.inverse(x, y)
      case SphericalSinusoidal(p) => p.inverse(x, y)
    }
}
