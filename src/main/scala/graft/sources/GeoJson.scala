package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.1 S7 — GeoJSON FeatureCollection scan.
  *
  * Reference reads amenity point layers (AminitiesGeoJSON geojson files) via
  * folium (DataDownloader_V2.py:96-102). Engine: `multiLine` JSON read →
  * explode(features) → flatten to the `features` schema. Properties are
  * sparse OSM tags whose keys contain ':' (`plant:source`), so they land in
  * a MapType, not a StructType.
  */
object GeoJson {

  /** Explicit feature schema: properties as map<string,string> so sparse /
    * colon-bearing keys survive. Point geometry only (all reference layers
    * are Points). */
  private val featureCollectionSchema = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("id", StringType),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType))))),
      StructField("properties", MapType(StringType, StringType))))))
  ))

  /** Read one FeatureCollection file into flat feature rows
    * (layer, id, lon, lat, properties). */
  def read(spark: SparkSession, path: String, layer: String): DataFrame =
    spark.read.option("multiLine", true).schema(featureCollectionSchema)
      .json(path)
      .select(explode(col("features")).as("f"))
      .select(
        lit(layer).as("layer"),
        col("f.id").as("id"),
        element_at(col("f.geometry.coordinates"), 1).as("lon"),
        element_at(col("f.geometry.coordinates"), 2).as("lat"),
        col("f.properties").as("properties"))

  /** P11 — tooltip field projection: extract a sparse property key with an
    * alias (reference `properties["name"]` → "Power Plant Name",
    * index.html:333-334). */
  def tooltip(features: DataFrame, key: String, alias: String): DataFrame =
    features.select(col("layer"), col("id"),
      element_at(col("properties"), key).as(alias))
}
