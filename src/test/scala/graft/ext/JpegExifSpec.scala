package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class JpegExifSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import Multimodal.JpegExif

  test("writer/prober round trip in BOTH TIFF byte orders") {
    for (le <- Seq(true, false)) {
      val b = JpegExif.encodeJpeg(littleEndian = le, xDensity = 96,
        yDensity = 120, make = "camX", orientation = 6,
        datetime = "2026:01:07 12:33:00", width = 40, height = 24,
        progressive = false)
      val m = JpegExif.probe(b).get
      assert(m.hasJfif && m.xDensity == 96 && m.yDensity == 120)
      assert(m.make == "camX" && m.orientation == 6)
      assert(m.datetime == "2026:01:07 12:33:00")
      assert(m.width == 40 && m.height == 24 && m.precision == 8)
      assert(m.nComponents == 3 && !m.progressive && m.nSegments == 5)
    }
  }

  test("progressive SOF2 is recognized") {
    val b = JpegExif.encodeJpeg(littleEndian = true, xDensity = 72,
      yDensity = 72, make = "c", orientation = 1,
      datetime = "2026:01:01 00:00:00", width = 8, height = 8,
      progressive = true)
    assert(JpegExif.probe(b).get.progressive)
  }

  test("probes a REAL ImageIO-written JPEG (cross-codec interop)") {
    val gray = Array.fill[Byte](32 * 16)(100)
    val b = Multimodal.MjpegCodec.jpegEncodeGray(gray, 32, 16)
    val m = JpegExif.probe(b).get
    // ImageIO emits an APP0 JFIF header and a baseline SOF0
    assert(m.hasJfif)
    assert(m.width == 32 && m.height == 16 && !m.progressive)
    // no EXIF in an ImageIO write — empty defaults, never garbage
    assert(m.make == "" && m.orientation == 0 && m.datetime == "")
  }

  test("non-JPEG and truncated bytes are rejected, not mangled") {
    assert(JpegExif.probe(null).isEmpty)
    assert(JpegExif.probe(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegExif.probe("PNGish".getBytes("ISO-8859-1")).isEmpty)
    val ok = JpegExif.encodeJpeg(littleEndian = true, xDensity = 72,
      yDensity = 72, make = "c", orientation = 1,
      datetime = "2026:01:01 00:00:00", width = 8, height = 8,
      progressive = false)
    // a torn tail still yields the fields parsed before the tear
    val torn = ok.take(ok.length / 2)
    assert(JpegExif.probe(torn).isDefined)
  }
}
