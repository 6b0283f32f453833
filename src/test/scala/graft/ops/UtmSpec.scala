package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class UtmSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("geometric invariants of the UTM projection") {
    // a point ON the central meridian maps to easting 500000 exactly
    val (e1, n1) = Utm.toUtm(30.0, Utm.zoneCentralMeridian(43), 43)
    assert(math.abs(e1 - 500000.0) < 1e-6)
    // the equator maps to northing 0
    val (_, n0) = Utm.toUtm(0.0, 75.0 + 0.5, 43)
    assert(math.abs(n0) < 1e-6)
    // northing grows with latitude, easting grows with longitude
    val (e2, n2) = Utm.toUtm(31.0, 76.0, 43)
    val (e3, n3) = Utm.toUtm(30.0, 76.0, 43)
    assert(n2 > n3)
    val (e4, _) = Utm.toUtm(30.0, 77.0, 43)
    assert(e4 > e3)
    // one degree of latitude ≈ 110.6-110.9 km of northing at 30°N
    assert(math.abs((n2 - n3) - 110857.0) < 500.0)
    // meridian scale: at the CM, 1° of latitude distance is scaled by k0;
    // meridian arc on WGS84 from 30° to 31° is ~110861.9 m → ×0.9996
    val (_, cmN30) = Utm.toUtm(30.0, Utm.zoneCentralMeridian(43), 43)
    val (_, cmN31) = Utm.toUtm(31.0, Utm.zoneCentralMeridian(43), 43)
    assert(math.abs((cmN31 - cmN30) / 110861.9 - 0.9996) < 1e-4)
  }

  test("forward∘inverse is identity to sub-millimeter over the zone") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val lat = -79.0 + rnd.nextDouble() * 160.0   // UTM validity band
      val lon = 75.0 + (rnd.nextDouble() - 0.5) * 5.9 // inside zone 43
      val (e, n) = Utm.toUtm(lat, lon, 43)
      val (lat2, lon2) = Utm.toLatLon(e, n, 43)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat → $lat2")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon → $lon2")
    }
  }

  test("southern hemisphere false northing round trip") {
    val (e, n) = Utm.toUtm(-33.9, 18.6, 34, north = false)
    assert(n > 0 && n < Utm.toUtm(-0.001, 18.6, 34, north = false)._2)
    val (lat, lon) = Utm.toLatLon(e, n, 34, north = false)
    assert(math.abs(lat - (-33.9)) < 1e-9 && math.abs(lon - 18.6) < 1e-9)
  }

  test("EPSG registry routes every UTM zone, both hemispheres, and fails closed") {
    assert(Crs.fromEpsg(32643).contains(Crs.UtmZone(43, north = true)))
    assert(Crs.fromEpsg(32743).contains(Crs.UtmZone(43, north = false)))
    assert(Crs.fromEpsg(32601).contains(Crs.UtmZone(1, north = true)))
    assert(Crs.fromEpsg(32760).contains(Crs.UtmZone(60, north = false)))
    assert(Crs.fromEpsg(4326).contains(Crs.Geographic))
    assert(Crs.fromEpsg(3857).contains(Crs.WebMercator))
    assert(Crs.fromEpsg(32661).isEmpty) // UPS — not a TM zone
    assert(Crs.fromEpsg(23700).isEmpty) // HD72/EOV — unregistered datum
    assert(Crs.fromCrsString("EPSG:32743").contains(Crs.UtmZone(43, false)))
    assert(Crs.fromCrsString("garbage").isEmpty)
    assert(Crs.fromCrsString(null).isEmpty)
  }

  test("registry inverse agrees with the projection cores it routes to") {
    // southern UTM through the registry = Utm.toLatLon with north=false
    val (e, n) = Utm.toUtm(-17.3, 75.4, 43, north = false)
    val (lon, lat) = Crs.toLonLat(Crs.UtmZone(43, north = false), e, n)
    assert(math.abs(lat - (-17.3)) < 1e-9 && math.abs(lon - 75.4) < 1e-9)
    // geographic pass-through
    assert(Crs.toLonLat(Crs.Geographic, 77.2, 28.6) == ((77.2, 28.6)))
    // Web-Mercator: registry inverse undoes the closed-form forward
    val x = 77.2 * math.Pi / 180.0 * 6378137.0
    val y = math.log(math.tan(math.Pi / 4.0 + 28.6 * math.Pi / 360.0)) * 6378137.0
    val (lonM, latM) = Crs.toLonLat(Crs.WebMercator, x, y)
    assert(math.abs(lonM - 77.2) < 1e-9 && math.abs(latM - 28.6) < 1e-9)
  }

  test("parameterized TM: the OS worked example round-trips on the " +
       "British National Grid (EPSG:27700)") {
    // Ordnance Survey "A guide to coordinate systems in Great Britain",
    // worked example: 52°39'27.2531"N 1°43'4.5177"E ↔
    // E 651409.903 N 313177.270
    val lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
    val lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
    val bng = Utm.Tmerc.BritishNationalGrid
    val (e, n) = bng.forward(lat, lon)
    assert(math.abs(e - 651409.903) < 5e-3, s"easting $e")
    assert(math.abs(n - 313177.270) < 5e-3, s"northing $n")
    val (latB, lonB) = bng.inverse(651409.903, 313177.270)
    assert(math.abs(latB - lat) < 2e-7 && math.abs(lonB - lon) < 2e-7)
    // the non-zero origin enters as a rectified offset, not zero
    assert(bng.xi0 > 0.0)
  }

  test("parameterized TM: NZTM2000 (EPSG:2193) round-trip and anchors") {
    val nz = Utm.Tmerc.Nztm2000
    // central meridian maps to the false easting exactly
    assert(math.abs(nz.forward(-41.0, 173.0)._1 - 1600000.0) < 1e-6)
    // forward∘inverse identity across the NZ extent
    for ((la, lo) <- Seq((-36.8485, 174.7633), (-41.2889, 174.7772),
                         (-45.8788, 170.5028))) {
      val (e, n) = nz.forward(la, lo)
      assert(e > 1.0e6 && e < 2.2e6 && n > 4.7e6 && n < 6.2e6,
        s"NZTM coords out of range: $e $n")
      val (la2, lo2) = nz.inverse(e, n)
      assert(math.abs(la2 - la) < 1e-9 && math.abs(lo2 - lo) < 1e-9)
    }
    // registry routes both codes and fails closed on near misses
    assert(Crs.fromEpsg(27700).nonEmpty && Crs.fromEpsg(2193).nonEmpty)
    assert(Crs.fromEpsg(27701).isEmpty)
    val (e, n) = nz.forward(-41.2889, 174.7772)
    val (lonR, latR) = Crs.toLonLat(Crs.fromEpsg(2193).get, e, n)
    assert(math.abs(latR - (-41.2889)) < 1e-9 &&
      math.abs(lonR - 174.7772) < 1e-9)
  }

  test("UDF reprojets a pixel table distributively") {
    val px = Seq((500000.0, 3320000.0), (612000.0, 3430000.0))
      .toDF("easting", "northing")
    val r = px.withColumn("ll",
      Utm.utmToLatLonUdf(43)(org.apache.spark.sql.functions.col("easting"),
                             org.apache.spark.sql.functions.col("northing")))
      .select("ll._1", "ll._2").collect()
    // 500000E on CM of zone 43 → lon exactly 75.0
    assert(math.abs(r(0).getDouble(1) - 75.0) < 1e-9)
    assert(r(0).getDouble(0) > 29.0 && r(0).getDouble(0) < 31.0)
  }
}
