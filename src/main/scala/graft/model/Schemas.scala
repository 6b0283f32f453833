package graft.model

import org.apache.spark.sql.types._

/** Core engine schemas, mirroring SURVEY.md §1.
  *
  * The reference's fundamental abstraction (an `ee.ImageCollection`,
  * reference `DataDownloader_V1.py:95-98`) is re-expressed as a long-format
  * pixel table: one row per (dataset, date, band, y, x) cell. A raster is a
  * group; a collection is the table. This keeps all raster algebra
  * declarative (groupBy/window/when) and lets Catalyst prune partitions on
  * `date`/`band`.
  */
object Schemas {

  /** Long-format raster pixel (SURVEY §1.1). `value` null = nodata
    * (reference NaN, `fix_transparency.py:58-60`). */
  val pixels: StructType = StructType(Seq(
    StructField("dataset", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true)
  ))

  /** Raster geometry metadata: affine transform + CRS + extent
    * (reference `regenerate_viirs_pngs.py:15`, `fix_transparency.py:68`). */
  val grids: StructType = StructType(Seq(
    StructField("dataset", StringType, nullable = false),
    StructField("a", DoubleType, nullable = false),
    StructField("b", DoubleType, nullable = false),
    StructField("c", DoubleType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("e", DoubleType, nullable = false),
    StructField("f", DoubleType, nullable = false),
    StructField("crs", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("nodata", DoubleType, nullable = true),
    StructField("scale_m", IntegerType, nullable = false)
  ))

  /** Flattened GeoJSON feature (reference AminitiesGeoJSON layer files;
    * properties are sparse OSM tags with ':' in keys → MapType). */
  val features: StructType = StructType(Seq(
    StructField("layer", StringType, nullable = false),
    StructField("id", StringType, nullable = true),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("properties", MapType(StringType, StringType), nullable = true)
  ))

  /** Per-band scalar threshold dimension
    * (reference `DataDownloader_V3.py:172-184` `standard_values`). */
  val standards: StructType = StructType(Seq(
    StructField("band", StringType, nullable = false),
    StructField("std_value", DoubleType, nullable = false)
  ))

  /** Bounding box in EPSG:4326 degrees
    * (reference `DataDownloader_V1.py:25` `ee.Geometry.Rectangle`). */
  case class BBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double)

  /** Delhi NCR study area, `DataDownloader_V2.py:24-28`. */
  val delhiNcr: BBox = BBox(76.85, 28.2, 77.65, 29.0)
}

/** Typed core row for Dataset[T] paths. */
case class Pixel(dataset: String, date: java.sql.Date, band: String,
                 y: Int, x: Int, lon: Double, lat: Double,
                 value: Option[Double])

/** Affine grid metadata (lon = c + (x+0.5)*a + (y+0.5)*b, lat analogous). */
case class GridMeta(dataset: String, a: Double, b: Double, c: Double,
                    d: Double, e: Double, f: Double, crs: String,
                    width: Int, height: Int, nodata: Option[Double],
                    scaleM: Int)
