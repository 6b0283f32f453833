package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F7 + §2.3 J1/J2 + §2.10 — geospatial scalar functions and
  * spatial joins.
  *
  * The affine pixel→coordinate transform is pure column arithmetic (stays in
  * whole-stage codegen). Point-in-polygon is a ray-casting UDF over a
  * broadcast polygon — the polygon is query-scoped and tiny, the pixels are
  * the 100 TB side, so the predicate is embarrassingly parallel.
  */
object GeoFns {

  /** F7 (affine part) — pixel index → geographic coordinate, center offset
    * (reference `rasterio.transform.xy(transform, rows, cols,
    * offset="center")`, fix_transparency.py:68). GDAL-style affine:
    * lon = c + (x+0.5)·a + (y+0.5)·b ; lat = f + (x+0.5)·d + (y+0.5)·e. */
  def affineLon(x: Column, y: Column, a: Column, b: Column, c: Column): Column =
    c + (x + lit(0.5)) * a + (y + lit(0.5)) * b

  def affineLat(x: Column, y: Column, d: Column, e: Column, f: Column): Column =
    f + (x + lit(0.5)) * d + (y + lit(0.5)) * e

  /** F7 (CRS part) — Web-Mercator (EPSG:3857) → EPSG:4326, the one
    * reprojection pair the raster web stack actually uses
    * (fix_transparency.py:72 `rasterio.warp.transform(src.crs,'EPSG:4326')`).
    * Closed-form spherical math, pure columns — no UDF, no GDAL. */
  def mercatorToLon(xMeters: Column): Column =
    xMeters / lit(6378137.0) * lit(180.0 / math.Pi)

  def mercatorToLat(yMeters: Column): Column =
    (atan(exp(yMeters / lit(6378137.0))) * lit(2.0) - lit(math.Pi / 2.0)) *
      lit(180.0 / math.Pi)

  /** Inverse: EPSG:4326 → Web-Mercator meters. */
  def lonToMercator(lon: Column): Column =
    lon * lit(math.Pi / 180.0) * lit(6378137.0)

  def latToMercator(lat: Column): Column =
    log(tan(lit(math.Pi / 4.0) + lat * lit(math.Pi / 360.0))) * lit(6378137.0)

  /** P6 (polygon case) — ray-casting point-in-polygon over a broadcast
    * polygon ring (Seq of (lon,lat), closed or open). Used when the clip
    * geometry is a real polygon rather than a bbox
    * (DataDownloader_SNPP_VIIRS_V1.py:36 `punjab.geometry()`). */
  def pointInPolygon(ring: Seq[(Double, Double)]): (Double, Double) => Boolean = {
    val xs = ring.map(_._1).toArray
    val ys = ring.map(_._2).toArray
    val n = xs.length
    (px: Double, py: Double) => {
      var inside = false
      var i = 0
      var j = n - 1
      while (i < n) {
        val intersects = ((ys(i) > py) != (ys(j) > py)) &&
          (px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i))
        if (intersects) inside = !inside
        j = i; i += 1
      }
      inside
    }
  }

  def pointInPolygonUdf(ring: Seq[(Double, Double)]) = {
    val f = pointInPolygon(ring)
    udf((lon: Double, lat: Double) => f(lon, lat))
  }

  /** J1 — raster⋈vector co-location as an equi-join on the snapped grid
    * cell key (reference overlays amenity points on raster cells,
    * DataDownloader_V2.py:96-104). Amenities are ≤ ~12k points → broadcast;
    * the pixel side never shuffles. */
  def cellKey(lon: Column, lat: Column, res: Double): (Column, Column) =
    (floor(lon / res).cast("long"), floor(lat / res).cast("long"))

  def cellJoin(pixels: DataFrame, points: DataFrame, res: Double): DataFrame = {
    val (pcx, pcy) = cellKey(pixels("lon"), pixels("lat"), res)
    val withKey = pixels.withColumn("cell_x", pcx).withColumn("cell_y", pcy)
    val (acx, acy) = cellKey(points("lon"), points("lat"), res)
    val pts = points
      .withColumn("cell_x", acx).withColumn("cell_y", acy)
      .withColumnRenamed("lon", "pt_lon")
      .withColumnRenamed("lat", "pt_lat")
    withKey.join(broadcast(pts), Seq("cell_x", "cell_y"), "inner")
  }

  /** J2 — boundary semi-join: keep pixels whose cell intersects the
    * (broadcast) boundary bbox set (reference filterBounds against a
    * FeatureCollection geometry, DataDownloader_SNPP_VIIRS_V1.py:140). */
  def boundarySemiJoin(pixels: DataFrame, boxes: DataFrame): DataFrame =
    pixels.join(broadcast(boxes),
      pixels("lon") >= boxes("min_lon") && pixels("lon") <= boxes("max_lon") &&
      pixels("lat") >= boxes("min_lat") && pixels("lat") <= boxes("max_lat"),
      "left_semi")
}
