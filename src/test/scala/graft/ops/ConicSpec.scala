package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class ConicSpec extends AnyFunSuite {

  // Snyder, USGS PP 1395, numerical examples (Appendix A) — both use
  // Clarke 1866, lat0 = 23°, lon0 = -96°, test point (35°N, 75°W).
  val snyderLcc = Conic.Lcc(Ellipsoid.Clarke1866,
    phi1Deg = 33.0, phi2Deg = 45.0, phi0Deg = 23.0, lam0Deg = -96.0)
  val snyderAlbers = Conic.Albers(Ellipsoid.Clarke1866,
    phi1Deg = 29.5, phi2Deg = 45.5, phi0Deg = 23.0, lam0Deg = -96.0)

  test("LCC forward matches Snyder's published worked example") {
    val (x, y) = snyderLcc.forward(35.0, -75.0)
    // published: x = 1,894,410.9 m, y = 1,564,649.5 m
    assert(math.abs(x - 1894410.9) < 1.0, s"x=$x")
    assert(math.abs(y - 1564649.5) < 1.0, s"y=$y")
  }

  test("Albers forward matches Snyder's published worked example") {
    val (x, y) = snyderAlbers.forward(35.0, -75.0)
    // published: x = 1,885,472.7 m, y = 1,535,925.0 m
    assert(math.abs(x - 1885472.7) < 1.0, s"x=$x")
    assert(math.abs(y - 1535925.0) < 1.0, s"y=$y")
  }

  test("Lambert-93 maps its grid origin to the false origin exactly") {
    // EPSG:2154 origin: (3°E, 46.5°N) → (700000, 6600000) by construction
    // (2SP: rho0 = rho(phi0))
    val p = Crs.fromEpsg(2154).get.asInstanceOf[Crs.LambertConic].p
    val (x, y) = p.forward(46.5, 3.0)
    assert(math.abs(x - 700000.0) < 1e-6 && math.abs(y - 6600000.0) < 1e-6)
    val (lon, lat) = p.inverse(700000.0, 6600000.0)
    assert(math.abs(lon - 3.0) < 1e-12 && math.abs(lat - 46.5) < 1e-12)
  }

  test("LCC round-trips forward→inverse across its valid domain") {
    val projs = Seq(snyderLcc,
      Crs.fromEpsg(2154).get.asInstanceOf[Crs.LambertConic].p,
      Crs.fromEpsg(3978).get.asInstanceOf[Crs.LambertConic].p,
      // 1SP variant with a non-unit scale factor
      Conic.Lcc(Ellipsoid.WGS84, 40.0, 40.0, 40.0, 10.0, k0 = 0.9998,
        falseE = 500000.0, falseN = 200000.0))
    val rnd = new scala.util.Random(11)
    projs.foreach { p =>
      (1 to 300).foreach { _ =>
        val lat = p.phi0Deg + (rnd.nextDouble() - 0.5) * 30.0
        val lon = p.lam0Deg + (rnd.nextDouble() - 0.5) * 30.0
        val (x, y) = p.forward(lat, lon)
        val (lon2, lat2) = p.inverse(x, y)
        assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
          s"$p: ($lat,$lon) -> ($x,$y) -> ($lat2,$lon2)")
      }
    }
  }

  test("Albers round-trips forward→inverse across its valid domain") {
    val projs = Seq(snyderAlbers,
      Crs.fromEpsg(5070).get.asInstanceOf[Crs.AlbersConic].p,
      Crs.fromEpsg(3310).get.asInstanceOf[Crs.AlbersConic].p,
      // coincident-parallel (1SP limit) variant
      Conic.Albers(Ellipsoid.WGS84, 35.0, 35.0, 30.0, -100.0))
    val rnd = new scala.util.Random(13)
    projs.foreach { p =>
      (1 to 300).foreach { _ =>
        val lat = math.max(-80, math.min(80,
          p.phi1Deg + (rnd.nextDouble() - 0.5) * 25.0))
        val lon = p.lam0Deg + (rnd.nextDouble() - 0.5) * 30.0
        val (x, y) = p.forward(lat, lon)
        val (lon2, lat2) = p.inverse(x, y)
        assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
          s"$p: ($lat,$lon) -> ($x,$y) -> ($lat2,$lon2)")
      }
    }
  }

  test("LCC is conformal: local scale is direction-independent") {
    // at any point, the east-west and north-south ground-scale factors of
    // a conformal projection agree; finite-difference both at h=0.1" arc
    val p = Crs.fromEpsg(2154).get.asInstanceOf[Crs.LambertConic].p
    val ell = Ellipsoid.GRS80
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    Seq((48.85, 2.35), (43.6, 1.44), (49.5, 7.7), (44.0, -0.57)).foreach {
      case (lat, lon) =>
        val h = 0.1 / 3600.0
        val phi = math.toRadians(lat)
        val sin2 = math.sin(phi) * math.sin(phi)
        // ellipsoid ground distances for h of latitude / longitude
        val m = ell.a * (1 - ell.e2) / math.pow(1 - ell.e2 * sin2, 1.5)
        val nRad = ell.a / math.sqrt(1 - ell.e2 * sin2)
        val dNorth = math.toRadians(h) * m
        val dEast = math.toRadians(h) * nRad * math.cos(phi)
        val kNS = dist(p.forward(lat + h, lon), p.forward(lat - h, lon)) / (2 * dNorth)
        val kEW = dist(p.forward(lat, lon + h), p.forward(lat, lon - h)) / (2 * dEast)
        assert(math.abs(kNS / kEW - 1.0) < 1e-7, s"($lat,$lon): $kNS vs $kEW")
        // scale ~1 inside the standard-parallel band
        assert(kEW > 0.998 && kEW < 1.002)
    }
  }

  test("LCC scale is exactly 1 on both standard parallels") {
    val p = snyderLcc
    val ell = Ellipsoid.Clarke1866
    Seq(33.0, 45.0).foreach { lat =>
      val phi = math.toRadians(lat)
      val mPar = math.cos(phi) /
        math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
      val h = 0.1 / 3600.0
      val dEast = math.toRadians(h) * ell.a * mPar
      val (x1, y1) = p.forward(lat, -96.0 + h)
      val (x2, y2) = p.forward(lat, -96.0 - h)
      val kEW = math.hypot(x1 - x2, y1 - y2) / (2 * dEast)
      assert(math.abs(kEW - 1.0) < 1e-9, s"parallel $lat: k=$kEW")
    }
  }

  test("Albers preserves area: Jacobian equals the ellipsoid area element") {
    val p = Crs.fromEpsg(5070).get.asInstanceOf[Crs.AlbersConic].p
    val ell = Ellipsoid.GRS80
    Seq((35.0, -100.0), (45.0, -80.0), (30.0, -115.0), (40.0, -96.0))
      .foreach { case (lat, lon) =>
        val h = 0.5 / 3600.0
        val hr = math.toRadians(h)
        def fd(f: Double => (Double, Double)): (Double, Double) = {
          val (xa, ya) = f(h); val (xb, yb) = f(-h)
          ((xa - xb) / (2 * hr), (ya - yb) / (2 * hr))
        }
        val (dxdphi, dydphi) = fd(d => p.forward(lat + d, lon))
        val (dxdlam, dydlam) = fd(d => p.forward(lat, lon + d))
        val jac = math.abs(dxdphi * dydlam - dxdlam * dydphi)
        val phi = math.toRadians(lat)
        val sin2 = math.sin(phi) * math.sin(phi)
        val truth = ell.a * ell.a * (1 - ell.e2) * math.cos(phi) /
          ((1 - ell.e2 * sin2) * (1 - ell.e2 * sin2))
        assert(math.abs(jac / truth - 1.0) < 1e-6, s"($lat,$lon): $jac vs $truth")
      }
  }

  test("LAEA forward matches Snyder's published worked example") {
    // Snyder PP 1395 LAEA ellipsoidal example: Clarke 1866, center
    // (40°N, 100°W), point (30°N, 110°W) → x = -965,932.1, y = -1,056,814.9
    val p = Conic.Laea(Ellipsoid.Clarke1866, phi0Deg = 40.0, lam0Deg = -100.0)
    val (x, y) = p.forward(30.0, -110.0)
    assert(math.abs(x - -965932.1) < 1.0, s"x=$x")
    assert(math.abs(y - -1056814.9) < 1.0, s"y=$y")
  }

  test("EPSG:3035 maps its grid origin to the false origin and round-trips") {
    val p = Crs.fromEpsg(3035).get.asInstanceOf[Crs.LaeaAzimuthal].p
    val (x, y) = p.forward(52.0, 10.0)
    assert(math.abs(x - 4321000.0) < 1e-6 && math.abs(y - 3210000.0) < 1e-6)
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val lat = 35.0 + rnd.nextDouble() * 35.0   // Europe band
      val lon = -10.0 + rnd.nextDouble() * 40.0
      val (px, py) = p.forward(lat, lon)
      val (lon2, lat2) = p.inverse(px, py)
      assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
        s"($lat,$lon) -> ($px,$py) -> ($lat2,$lon2)")
    }
  }

  test("LAEA preserves area: Jacobian equals the ellipsoid area element") {
    val p = Crs.fromEpsg(3035).get.asInstanceOf[Crs.LaeaAzimuthal].p
    val ell = Ellipsoid.GRS80
    Seq((48.8, 2.3), (60.2, 25.0), (38.7, -9.1), (52.5, 13.4)).foreach {
      case (lat, lon) =>
        val h = 0.5 / 3600.0
        val hr = math.toRadians(h)
        def fd(f: Double => (Double, Double)): (Double, Double) = {
          val (xa, ya) = f(h); val (xb, yb) = f(-h)
          ((xa - xb) / (2 * hr), (ya - yb) / (2 * hr))
        }
        val (dxdphi, dydphi) = fd(dd => p.forward(lat + dd, lon))
        val (dxdlam, dydlam) = fd(dd => p.forward(lat, lon + dd))
        val jac = math.abs(dxdphi * dydlam - dxdlam * dydphi)
        val phi = math.toRadians(lat)
        val sin2 = math.sin(phi) * math.sin(phi)
        val truth = ell.a * ell.a * (1 - ell.e2) * math.cos(phi) /
          ((1 - ell.e2 * sin2) * (1 - ell.e2 * sin2))
        assert(math.abs(jac / truth - 1.0) < 1e-6, s"($lat,$lon): $jac vs $truth")
    }
  }

  test("polar stereographic forward matches Snyder's published example") {
    // Snyder PP 1395 numerical example: International ellipsoid, south
    // polar aspect, φc = −71°, λ0 = −100°, point (−75°, 150°E)
    //   → x = −1,540,033.6 m, y = −560,526.4 m
    val intl = Ellipsoid(6378388.0, 297.0)
    val p = Conic.PolarStereo(intl, latTsDeg = -71.0, lam0Deg = -100.0)
    val (x, y) = p.forward(-75.0, 150.0)
    assert(math.abs(x - -1540033.6) < 1.0, s"x=$x")
    assert(math.abs(y - -560526.4) < 1.0, s"y=$y")
    // inverse recovers the point, including the ±180° longitude wrap
    // (λ0 + θ = −210° here)
    val (lon, lat) = p.inverse(x, y)
    assert(math.abs(lon - 150.0) < 1e-9 && math.abs(lat - -75.0) < 1e-9)
  }

  test("polar stereographic round-trips both aspects across the cap") {
    val projs = Seq(
      Crs.fromEpsg(3413).get.asInstanceOf[Crs.PolarStereographic].p,
      Crs.fromEpsg(3031).get.asInstanceOf[Crs.PolarStereographic].p)
    val rnd = new scala.util.Random(19)
    projs.foreach { p =>
      val s = if (p.north) 1.0 else -1.0
      (1 to 300).foreach { _ =>
        val lat = s * (55.0 + rnd.nextDouble() * 34.9)
        val lon = -180.0 + rnd.nextDouble() * 360.0
        val (x, y) = p.forward(lat, lon)
        val (lon2, lat2) = p.inverse(x, y)
        assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
          s"$p: ($lat,$lon) -> ($x,$y) -> ($lat2,$lon2)")
      }
      // the pole itself maps to the false origin and back
      val (px, py) = p.forward(s * 90.0, 123.0)
      assert(math.abs(px - 0.0) < 1e-6 && math.abs(py - 0.0) < 1e-6)
      val (_, latPole) = p.inverse(px, py)
      assert(math.abs(latPole - s * 90.0) < 1e-9)
    }
  }

  test("polar stereographic is conformal: local scale direction-free, " +
       "exactly 1 on the standard parallel") {
    val p = Crs.fromEpsg(3413).get.asInstanceOf[Crs.PolarStereographic].p
    val ell = Ellipsoid.WGS84
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    Seq((70.0, -45.0), (70.0, 120.0), (85.0, 10.0), (62.0, -100.0)).foreach {
      case (lat, lon) =>
        val h = 0.1 / 3600.0
        val phi = math.toRadians(lat)
        val sin2 = math.sin(phi) * math.sin(phi)
        val m = ell.a * (1 - ell.e2) / math.pow(1 - ell.e2 * sin2, 1.5)
        val nRad = ell.a / math.sqrt(1 - ell.e2 * sin2)
        val dNorth = math.toRadians(h) * m
        val dEast = math.toRadians(h) * nRad * math.cos(phi)
        val kNS = dist(p.forward(lat + h, lon), p.forward(lat - h, lon)) /
          (2 * dNorth)
        val kEW = dist(p.forward(lat, lon + h), p.forward(lat, lon - h)) /
          (2 * dEast)
        assert(math.abs(kNS / kEW - 1.0) < 1e-7, s"($lat,$lon): $kNS vs $kEW")
        if (lat == 70.0) assert(math.abs(kEW - 1.0) < 1e-9,
          s"standard parallel: k=$kEW")
    }
  }

  test("sinusoidal: anchors, round trip, and equal-area Jacobian") {
    val p = Crs.ModisSinusoidal
    val r = p.r
    // anchors straight from the closed forms
    assert(p.forward(0.0, 0.0) == (0.0, 0.0))
    val (xe, ye) = p.forward(0.0, 10.0) // equator: x = R·Δλ, y = 0
    assert(math.abs(xe - r * math.toRadians(10.0)) < 1e-9 && ye == 0.0)
    val (x0, y0) = p.forward(45.0, 0.0) // central meridian: x = 0
    assert(x0 == 0.0 && math.abs(y0 - r * math.toRadians(45.0)) < 1e-9)
    // round trip across the MODIS-latitude band
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      val lat = -85.0 + rnd.nextDouble() * 170.0
      val lon = -170.0 + rnd.nextDouble() * 340.0
      val (px, py) = p.forward(lat, lon)
      val (lon2, lat2) = p.inverse(px, py)
      assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
        s"($lat,$lon) -> ($px,$py) -> ($lat2,$lon2)")
    }
    // pole point on the central meridian: x = 0 → λ0, φ = 90
    val (lonP, latP) = p.inverse(0.0, r * math.Pi / 2)
    assert(lonP == 0.0 && math.abs(latP - 90.0) < 1e-9)
    // equal-area on the sphere: |J| = R² cos φ
    Seq((10.0, 20.0), (45.0, -60.0), (70.0, 100.0)).foreach {
      case (lat, lon) =>
        val h = 0.5 / 3600.0
        val hr = math.toRadians(h)
        def fd(f: Double => (Double, Double)): (Double, Double) = {
          val (xa, ya) = f(h); val (xb, yb) = f(-h)
          ((xa - xb) / (2 * hr), (ya - yb) / (2 * hr))
        }
        val (dxdphi, dydphi) = fd(d => p.forward(lat + d, lon))
        val (dxdlam, dydlam) = fd(d => p.forward(lat, lon + d))
        val jac = math.abs(dxdphi * dydlam - dxdlam * dydphi)
        val truth = r * r * math.cos(math.toRadians(lat))
        assert(math.abs(jac / truth - 1.0) < 1e-7, s"($lat,$lon): $jac vs $truth")
    }
  }

  test("registry: conic codes resolve, unknown codes still fail closed") {
    assert(Crs.fromEpsg(2154).isDefined && Crs.fromEpsg(3978).isDefined)
    assert(Crs.fromEpsg(5070).isDefined && Crs.fromEpsg(3310).isDefined)
    assert(Crs.fromEpsg(3035).isDefined)
    assert(Crs.fromEpsg(3413).isDefined && Crs.fromEpsg(3031).isDefined)
    assert(Crs.fromEpsg(53008).isDefined) // ESRI Sphere_Sinusoidal
    assert(Crs.fromEpsg(27700).isDefined) // OSGB TM (round 9)
    assert(Crs.fromEpsg(2193).isDefined)  // NZTM (round 9)
    assert(Crs.fromEpsg(23700).isEmpty)   // HD72/EOV: not registered
    // Crs.toLonLat dispatch for the conic branches
    val (lon, lat) = Crs.toLonLat(Crs.fromEpsg(2154).get, 700000.0, 6600000.0)
    assert(math.abs(lon - 3.0) < 1e-12 && math.abs(lat - 46.5) < 1e-12)
  }
}
