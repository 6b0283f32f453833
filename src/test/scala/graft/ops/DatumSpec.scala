package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class DatumSpec extends AnyFunSuite {

  private def groundMeters(lat1: Double, lon1: Double,
                           lat2: Double, lon2: Double): Double = {
    val dlat = (lat2 - lat1) * 110574.0
    val dlon = (lon2 - lon1) * 111320.0 * math.cos(math.toRadians(lat1))
    math.hypot(dlat, dlon)
  }

  test("geodetic <-> geocentric round-trips on one ellipsoid to 1e-12 deg") {
    for ((lat, lon) <- Seq((51.4769, -0.0005), (0.0, 0.0), (-41.3, 174.8),
      (89.0, 12.0), (-33.9, -151.2))) {
      val (x, y, z) = Datum.toGeocentric(Ellipsoid.WGS84, lat, lon)
      val (la, lo) = Datum.toGeodeticDeg(Ellipsoid.WGS84, x, y, z)
      assert(math.abs(la - lat) < 1e-12, s"lat $lat")
      assert(math.abs(lo - lon) < 1e-12, s"lon $lon")
    }
  }

  test("OSGB36 -> WGS84: Greenwich's OSGB36 zero meridian lands ~112 m " +
    "WEST in WGS84 (the famous GPS-vs-meridian-line offset)") {
    val (lat, lon) = Datum.shiftToWgs84(Ellipsoid.Airy1830,
      Datum.Osgb36ToWgs84, 51.4769, 0.0)
    // direction and magnitude of the documented datum skew: the WGS84
    // longitude of an OSGB36-zero-longitude point is ~ -0.0016 deg
    assert(lon < -0.0010 && lon > -0.0022, s"lon $lon")
    assert(lat > 51.4769, "OSGB36->WGS84 shifts London points north")
    val d = groundMeters(51.4769, 0.0, lat, lon)
    assert(d > 80 && d < 160, s"total London skew $d m (expect ~126)")
    // and in Scotland the skew is smaller but still tens of meters
    val (la2, lo2) = Datum.shiftToWgs84(Ellipsoid.Airy1830,
      Datum.Osgb36ToWgs84, 57.0, -4.0)
    val d2 = groundMeters(57.0, -4.0, la2, lo2)
    assert(d2 > 40 && d2 < 130, s"Scotland skew $d2 m (expect ~85)")
  }

  test("Helmert reversal: shift then unshift closes to ~1 cm (the " +
    "linearized method's |s|*|t| cross-term residual)") {
    for ((lat, lon) <- Seq((51.4769, 0.0), (57.0, -4.0), (50.1, -5.5))) {
      val (la, lo) = Datum.shiftToWgs84(Ellipsoid.Airy1830,
        Datum.Osgb36ToWgs84, lat, lon)
      val (lb, lob) = Datum.shiftFromWgs84(Ellipsoid.Airy1830,
        Datum.Osgb36ToWgs84, la, lo)
      assert(groundMeters(lat, lon, lb, lob) < 0.02,
        s"round trip drift at ($lat, $lon)")
    }
  }

  test("Crs.toWgs84LonLat routes the registered Helmert: EPSG:27700 " +
    "differs from the native inverse by the datum skew; WGS84-family " +
    "codes are identical") {
    // a BNG easting/northing in central London
    val (e, n) = (530000.0, 180000.0)
    val (lonNative, latNative) =
      Crs.toLonLat(Crs.fromEpsg(27700).get, e, n)
    val Some((lonW, latW)) = Crs.toWgs84LonLat(27700, e, n)
    val skew = groundMeters(latNative, lonNative, latW, lonW)
    assert(skew > 80 && skew < 160, s"27700 skew $skew m")
    // NZTM2000 (NZGD2000 = WGS84-compatible): bit-identical passthrough
    val (e2, n2) = (1600000.0, 6000000.0)
    val (lon2, lat2) = Crs.toLonLat(Crs.fromEpsg(2193).get, e2, n2)
    assert(Crs.toWgs84LonLat(2193, e2, n2).contains((lon2, lat2)))
    // unregistered code still fails closed
    assert(Crs.toWgs84LonLat(99999, 0.0, 0.0).isEmpty)
  }
}
