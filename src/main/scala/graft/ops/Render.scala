package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F5/F6 + §2.1 S6 — colormap application and the PNG render
  * sink.
  *
  * The colormap is a 256-entry LUT computed from matplotlib's published
  * colormap definitions ('jet' segment data, ColorBrewer 'Reds' anchors —
  * both public tables) with matplotlib's own piecewise-linear resampling
  * (`_create_lookup_table`), so the byte output matches the reference's
  * `cmap(norm_img)` → `(rgba*255).astype(uint8)` pipeline exactly
  * (DataDownloader_V1.py:65-68, regenerate_viirs_pngs.py:31-44). In-engine
  * the LUT is `element_at` over a literal array column — constant-folded,
  * codegen'd, no UDF. The PNG encode itself is a bounded driver-side sink:
  * one collected raster (≤ a few hundred k cells after compositing) per
  * image, exactly like the reference.
  */
object Render {

  /** matplotlib `_create_lookup_table(256, segments)`: piecewise-linear
    * resample of `(x, y0, y1)` breakpoints onto 256 samples, mirroring the
    * numpy arithmetic (x scaled by N-1, searchsorted-left, endpoint
    * overrides, clip to [0,1]) so every double matches bit-for-bit. */
  private def lookupTable(segments: Seq[(Double, Double, Double)]): Array[Double] = {
    val n = 256
    val x = segments.map(_._1 * (n - 1)).toArray
    val y0 = segments.map(_._2).toArray
    val y1 = segments.map(_._3).toArray
    val step = 1.0 / (n - 1) // numpy linspace(0,1,256) step
    Array.tabulate(n) { i =>
      if (i == 0) y1(0)
      else if (i == n - 1) y0(x.length - 1)
      else {
        val xi = (n - 1) * (i * step)
        val ind = x.indexWhere(_ >= xi) // searchsorted side='left'
        val d = (xi - x(ind - 1)) / (x(ind) - x(ind - 1))
        val v = d * (y0(ind) - y1(ind - 1)) + y1(ind - 1)
        math.min(1.0, math.max(0.0, v))
      }
    }
  }

  /** matplotlib `_jet_data` (matplotlib/_cm.py, public): per-channel
    * (x, y0, y1) breakpoints. */
  private val jetSegments: Map[String, Seq[(Double, Double, Double)]] = Map(
    "red" -> Seq((0.0, 0.0, 0.0), (0.35, 0.0, 0.0), (0.66, 1.0, 1.0),
                 (0.89, 1.0, 1.0), (1.0, 0.5, 0.5)),
    "green" -> Seq((0.0, 0.0, 0.0), (0.125, 0.0, 0.0), (0.375, 1.0, 1.0),
                   (0.64, 1.0, 1.0), (0.91, 0.0, 0.0), (1.0, 0.0, 0.0)),
    "blue" -> Seq((0.0, 0.5, 0.5), (0.11, 1.0, 1.0), (0.34, 1.0, 1.0),
                  (0.65, 0.0, 0.0), (1.0, 0.0, 0.0)))

  /** ColorBrewer 9-class 'Reds' (matplotlib `_Reds_data`, public): evenly
    * spaced anchors, stored as n/255 fractions exactly as matplotlib does. */
  private val redsAnchors: Seq[(Int, Int, Int)] = Seq(
    (255, 245, 240), (254, 224, 210), (252, 187, 161), (252, 146, 114),
    (251, 106, 74), (239, 59, 44), (203, 24, 29), (165, 15, 21), (103, 0, 13))

  private def channelBytes(lut: Array[Double]): Array[Int] =
    lut.map(v => (v * 255.0).toInt) // reference: (rgba*255).astype(uint8)

  /** 256-entry RGBA byte LUTs, identical to
    * `(get_cmap(name)(linspace)*255).astype(uint8)`. */
  val jetLut: Array[(Int, Int, Int, Int)] = {
    val r = channelBytes(lookupTable(jetSegments("red")))
    val g = channelBytes(lookupTable(jetSegments("green")))
    val b = channelBytes(lookupTable(jetSegments("blue")))
    Array.tabulate(256)(i => (r(i), g(i), b(i), 255))
  }

  val redsLut: Array[(Int, Int, Int, Int)] = {
    def seg(ch: ((Int, Int, Int)) => Int): Seq[(Double, Double, Double)] =
      redsAnchors.zipWithIndex.map { case (c, i) =>
        (i / 8.0, ch(c) / 255.0, ch(c) / 255.0)
      }
    val r = channelBytes(lookupTable(seg(_._1)))
    val g = channelBytes(lookupTable(seg(_._2)))
    val b = channelBytes(lookupTable(seg(_._3)))
    Array.tabulate(256)(i => (r(i), g(i), b(i), 255))
  }

  /** matplotlib `Colormap.__call__` index mapping: `int(v*N)` (N=256,
    * truncating) with v==1.0 and the over/under ranges clamped into
    * [0, 255]. NOT the same as F6's value quantization (`v*255`). */
  def cmapIndex(norm: Column): Column =
    least(greatest((norm * 256.0).cast("int"), lit(0)), lit(255))

  /** F5 — apply a LUT to a normalized [0,1] column via element_at over a
    * literal array (1-based). Stays inside whole-stage codegen. */
  def applyLut(norm: Column, lut: Array[(Int, Int, Int, Int)]): Column = {
    val rs = array(lut.map(t => lit(t._1)): _*)
    val gs = array(lut.map(t => lit(t._2)): _*)
    val bs = array(lut.map(t => lit(t._3)): _*)
    val idx = cmapIndex(norm) + 1
    struct(element_at(rs, idx).as("r"), element_at(gs, idx).as("g"),
           element_at(bs, idx).as("b"), lit(255).as("a"))
  }

  /** S6 — driver-side PNG encode of one collected raster (bounded: one
    * composited grid, like the reference's per-raster PIL write,
    * regenerate_viirs_pngs.py:44-48). Pure-JVM via java.imageio. */
  def writePng(rows: Array[(Int, Int, Int, Int, Int, Int)], // y,x,r,g,b,a
               width: Int, height: Int, path: String): Unit = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    rows.foreach { case (y, x, r, g, b, a) =>
      if (y >= 0 && y < height && x >= 0 && x < width)
        img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    javax.imageio.ImageIO.write(img, "png", new java.io.File(path))
  }
}
