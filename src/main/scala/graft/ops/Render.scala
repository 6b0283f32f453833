package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F5/F6 + §2.1 S6 — colormap application and the PNG render
  * sink.
  *
  * The colormap is a 256-entry LUT (matplotlib 'jet'/'Reds',
  * DataDownloader_V1.py:65-68). In-engine it's `element_at` over a literal
  * array column — constant-folded, codegen'd, no UDF. The PNG encode itself
  * is a bounded driver-side sink: one collected raster (≤ a few hundred k
  * cells after compositing) per image, exactly like the reference.
  */
object Render {

  /** matplotlib 'jet' approximation as a closed-form piecewise ramp —
    * identical shape to the classic jet: blue→cyan→yellow→red. */
  private def jetChannel(v: Double, center: Double): Int = {
    val d = math.abs(v - center)
    val c = if (d <= 0.125) 1.0 else if (d >= 0.375) 0.0 else (0.375 - d) / 0.25
    math.max(0, math.min(255, (c * 255).round.toInt))
  }

  /** 256-entry RGBA LUTs. */
  def jetLut: Array[(Int, Int, Int, Int)] =
    (0 until 256).map { i =>
      val v = i / 255.0
      (jetChannel(v, 0.75), jetChannel(v, 0.5), jetChannel(v, 0.25), 255)
    }.toArray

  /** 'Reds' ramp: white→red. */
  def redsLut: Array[(Int, Int, Int, Int)] =
    (0 until 256).map { i =>
      val v = i / 255.0
      ((255 - 16 * v).toInt, (240 - 180 * v).toInt, (230 - 210 * v).toInt, 255)
    }.toArray

  /** F5 — apply a LUT to a normalized [0,1] column via element_at over a
    * literal array (1-based). Stays inside whole-stage codegen. */
  def applyLut(norm: Column, lut: Array[(Int, Int, Int, Int)]): Column = {
    val rs = array(lut.map(t => lit(t._1)): _*)
    val gs = array(lut.map(t => lit(t._2)): _*)
    val bs = array(lut.map(t => lit(t._3)): _*)
    val idx = Normalize.quantize255(norm) + 1
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
