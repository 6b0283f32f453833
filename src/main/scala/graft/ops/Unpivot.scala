package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.GridMeta

/** SURVEY §2.8 F8 — raster→table unpivot (2-D explode).
  *
  * The reference ravels a dense H×W array into one row per pixel with
  * meshgrid coordinates (fix_transparency.py:62-78). Here a raster is
  * declared by its GridMeta and exploded distributively:
  * `explode(sequence(0, h*w-1))` → (y,x) by div/mod → affine coords.
  * sequence+explode is a codegen'd Generator — each grid expands inside its
  * task, no shuffle; `repartition` by grid slices first if one raster is
  * huge.
  */
object Unpivot {

  /** Expand grid metadata rows into a long pixel-coordinate table.
    * Input df must have (dataset, a,b,c,d,e,f, width, height). */
  def gridToPixels(grids: DataFrame): DataFrame = {
    val idx = explode(sequence(lit(0), col("width") * col("height") - 1)).as("i")
    grids.select(col("*"), idx)
      .withColumn("y", (col("i") / col("width")).cast("int"))
      .withColumn("x", (col("i") % col("width")).cast("int"))
      .withColumn("lon", GeoFns.affineLon(col("x"), col("y"), col("a"), col("b"), col("c")))
      .withColumn("lat", GeoFns.affineLat(col("x"), col("y"), col("d"), col("e"), col("f")))
      .drop("i")
  }

  /** Typed variant for a single grid. */
  def gridToPixels(spark: SparkSession, g: GridMeta): DataFrame = {
    import spark.implicits._
    gridToPixels(Seq(g).toDF("dataset", "a", "b", "c", "d", "e", "f", "crs",
      "width", "height", "nodata", "scale_m"))
  }
}
