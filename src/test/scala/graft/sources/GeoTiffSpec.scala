package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.model.GridMeta

/** S4 write→parse round trips. The s4demo fixture is the canonical raster
  * the `s4_geotiff_scan` query reads and the DuckDB oracle regenerates from
  * `range()` — the byte-equality test pins the writer's determinism so the
  * checked-in fixture can never drift from the in-code definition.
  */
object GeoTiffFixture {
  // UTM CRS + inline (<=4 byte) nodata + 3 strips: the three paths the
  // round-2 writer bug corrupted (lost GeoKeyDirectory / GDAL_NODATA).
  val meta: GridMeta = GridMeta("s4demo.tif",
    a = 0.25, b = 0.0, c = 10.0, d = 0.0, e = -0.25, f = 60.0,
    crs = "EPSG:32643", width = 48, height = 40, nodata = Some(-1.0),
    scaleM = 1)
  // exact in float32 and reproducible in SQL: k%13==0 -> nodata, else k%97
  val values: Array[Float] = Array.tabulate(meta.width * meta.height)(k =>
    if (k % 13 == 0) -1.0f else (k % 97).toFloat)
  def bytes: Array[Byte] = GeoTiff.write(meta, values, rowsPerStrip = 16)
  val path = "/root/repo/src/test/resources/s4demo.tif"
}

class GeoTiffSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def roundTrip(meta: GridMeta, values: Array[Float],
                        rowsPerStrip: Int = 64, bigEndian: Boolean = false)
      : GeoTiff.Raster =
    GeoTiff.parse(meta.dataset,
      GeoTiff.write(meta, values, rowsPerStrip, bigEndian))

  test("S4 write→parse round trip: UTM CRS and nodata survive") {
    val r = roundTrip(GeoTiffFixture.meta, GeoTiffFixture.values,
      rowsPerStrip = 16)
    assert(r.meta.crs == "EPSG:32643")          // lost by the r2 nTags bug
    assert(r.meta.nodata.contains(-1.0))        // likewise
    assert(r.meta.width == 48 && r.meta.height == 40)
    assert(r.meta.a == 0.25 && r.meta.e == -0.25)
    assert(r.meta.c == 10.0 && r.meta.f == 60.0)
    assert(r.values.sameElements(GeoTiffFixture.values))
  }

  test("S4 round trip: geographic CRS, long external nodata, single strip") {
    val meta = GridMeta("geo.tif", 0.01, 0.0, 77.0, 0.0, -0.01, 29.0,
      "EPSG:4326", width = 7, height = 5, nodata = Some(-9999.25), scaleM = 1113)
    val values = Array.tabulate(35)(_.toFloat)
    val r = roundTrip(meta, values, rowsPerStrip = 64) // 1 strip -> inline offset
    assert(r.meta.crs == "EPSG:4326")
    assert(r.meta.nodata.contains(-9999.25))    // "-9999.25\0" > 4B, external
    assert(r.values.sameElements(values))
  }

  test("S4 round trip: big-endian byte order") {
    val meta = GeoTiffFixture.meta.copy(dataset = "be.tif")
    val r = roundTrip(meta, GeoTiffFixture.values, rowsPerStrip = 16,
      bigEndian = true)
    assert(r.meta.crs == "EPSG:32643" && r.meta.nodata.contains(-1.0))
    assert(r.values.sameElements(GeoTiffFixture.values))
  }

  test("S4 round trip: no nodata tag at all") {
    val meta = GeoTiffFixture.meta.copy(dataset = "nd.tif", nodata = None)
    val r = roundTrip(meta, GeoTiffFixture.values)
    assert(r.meta.nodata.isEmpty)
    assert(r.meta.crs == "EPSG:32643")
  }

  test("s4demo fixture bytes match the writer output exactly") {
    val onDisk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(GeoTiffFixture.path))
    assert(onDisk.sameElements(GeoTiffFixture.bytes),
      "checked-in s4demo.tif drifted from GeoTiffFixture — regenerate it " +
        "with GeoTiffFixture.bytes")
  }

  test("S4 scan: fixture -> pixel table with nodata as null") {
    val df = GeoTiff.read(spark, GeoTiffFixture.path)
    val n = df.count()
    assert(n == 48L * 40L)
    val nulls = df.filter("value IS NULL").count()
    assert(nulls == (0 until 1920).count(_ % 13 == 0))
    val first = df.filter("y = 0 AND x = 1").head()
    assert(first.getDouble(3) == 10.0 + 1.5 * 0.25)   // lon
    assert(first.getDouble(4) == 60.0 - 0.5 * 0.25)   // lat
    assert(first.getDouble(5) == 1.0)
  }

  test("S11 grids: metadata without touching strip data") {
    val g = GeoTiff.grids(spark, GeoTiffFixture.path).head()
    assert(g.getString(0) == "s4demo.tif")
    assert(g.getInt(8) == 48 && g.getInt(9) == 40)
    assert(g.getString(7) == "EPSG:32643")
  }
  test("malformed inputs fail loudly, never decode wrong") {
    val good = GeoTiffFixture.bytes
    // bad byte-order mark
    val badBom = good.clone(); badBom(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](GeoTiff.parse("x.tif", badBom))
    // bad magic
    val badMagic = good.clone(); badMagic(2) = 0; badMagic(3) = 0
    assertThrows[IllegalArgumentException](GeoTiff.parse("x.tif", badMagic))
    // truncated strip data: header promises more pixels than present
    val truncated = java.util.Arrays.copyOf(good, good.length - 512)
    assertThrows[Exception](GeoTiff.parse("x.tif", truncated))
    // unsupported compression tag (259 -> 5 = LZW)
    val lzw = good.clone()
    // find tag 259 in the IFD (starts at offset 8 + 2)
    val n = (lzw(8) & 0xFF) | ((lzw(9) & 0xFF) << 8)
    var at = 10
    var patched = false
    (0 until n).foreach { _ =>
      val tag = (lzw(at) & 0xFF) | ((lzw(at + 1) & 0xFF) << 8)
      if (tag == 259) { lzw(at + 8) = 5; patched = true }
      at += 12
    }
    assert(patched)
    val e = intercept[IllegalArgumentException](GeoTiff.parse("x.tif", lzw))
    assert(e.getMessage.contains("Compression"))
  }
}

/** Regenerates the checked-in fixture: `sbt "Test/runMain graft.sources.GenS4Fixture"`. */
object GenS4Fixture {
  def main(args: Array[String]): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(GeoTiffFixture.path), GeoTiffFixture.bytes)
    println(s"wrote ${GeoTiffFixture.bytes.length} bytes to ${GeoTiffFixture.path}")
  }
}
