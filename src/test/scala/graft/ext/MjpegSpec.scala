package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ext.Multimodal.{AviCodec, MjpegCodec}

class MjpegSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("flat frames round-trip EXACTLY through JPEG + MJPEG container") {
    val frames = Seq(0, 17, 128, 200, 255).map(v =>
      Array.fill[Byte](64)(v.toByte))
    val avi = MjpegCodec.encodeAviMjpeg(frames, 8, 8, fps = 10)
    val back = MjpegCodec.decodeAviMjpeg(avi)
    assert(back.isDefined)
    val a = back.get
    assert(a.width == 8 && a.height == 8 && a.fps == 10)
    assert(a.frames.length == frames.length)
    a.frames.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.sameElements(want), s"flat frame $i not exact")
    }
  }

  test("textured frames decode within JPEG tolerance at quality 1.0") {
    val frame = Array.tabulate[Byte](16 * 16)(i =>
      ((i * 7 + (i / 16) * 3) % 256).toByte)
    val avi = MjpegCodec.encodeAviMjpeg(Seq(frame), 16, 16)
    val got = MjpegCodec.decodeAviMjpeg(avi).get.frames.head
    val maxErr = got.zip(frame)
      .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.max
    assert(maxErr <= 4, s"quality-1.0 JPEG drifted by $maxErr gray levels")
  }

  test("codec probes are mutually exclusive and never throw") {
    val gray = AviCodec.encodeAviGray(Seq(Array.fill[Byte](64)(9)), 8, 8)
    val mjpg = MjpegCodec.encodeAviMjpeg(Seq(Array.fill[Byte](64)(9)), 8, 8)
    assert(MjpegCodec.decodeAviMjpeg(gray).isEmpty, "MJPEG decoded a DIB AVI")
    assert(AviCodec.decodeAviGray(mjpg).isEmpty, "DIB decoded an MJPEG AVI")
    // torn/junk payloads probe to None — a tear mid-movi leaves no
    // complete frame chunk
    assert(MjpegCodec.decodeAviMjpeg(mjpg.take(mjpg.length / 3)).isEmpty)
    assert(MjpegCodec.decodeAviMjpeg("junk".getBytes).isEmpty)
    assert(MjpegCodec.decodeAviMjpeg(null).isEmpty)
    assert(MjpegCodec.decodeAviMjpeg(Array.empty[Byte]).isEmpty)
  }

  test("ffmpeg-style interop: fps and frame order preserved") {
    val frames = (0 until 6).map(k => Array.fill[Byte](64)((k * 40).toByte))
    val avi = MjpegCodec.encodeAviMjpeg(frames, 8, 8, fps = 25)
    val a = MjpegCodec.decodeAviMjpeg(avi).get
    assert(a.fps == 25)
    assert(a.frames.map(f => f(0) & 0xFF) == (0 until 6).map(k => k * 40))
  }
}
