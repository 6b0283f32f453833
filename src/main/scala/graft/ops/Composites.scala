package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 — aggregations (temporal composites, grid resample, unions).
  *
  * All hash-agg shaped: Catalyst plans partial (map-side) + final aggregation
  * automatically, so at 100 TB each executor pre-combines its pixels before
  * the shuffle — shuffle volume is O(distinct cells), not O(rows).
  */
object Composites {

  /** A1 — per-pixel temporal MEAN composite (reference `collection.mean()`,
    * DataDownloader_V1.py:145). Spark `avg` is null-skipping, matching EE's
    * NaN-skipping mean. */
  def meanComposite(df: DataFrame, keys: Seq[String] = Seq("band", "y", "x"),
                    valueCol: String = "value"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(avg(valueCol).as("mean_value"))

  /** A2 — per-pixel temporal MAX composite (reference
    * `frp_collection.max()`, DataDownloader_SNPP_VIIRS_V1.py:155). */
  def maxComposite(df: DataFrame, keys: Seq[String] = Seq("y", "x"),
                   valueCol: String = "value"): DataFrame =
    df.groupBy(keys.map(col): _*).agg(max(valueCol).as("max_value"))

  /** A3 — collection size / emptiness guard (reference `collection.size()`,
    * DataDownloader_V1.py:100). */
  def collectionSize(df: DataFrame, imageKeys: Seq[String] = Seq("date")): DataFrame =
    df.agg(countDistinct(imageKeys.head, imageKeys.tail: _*).as("n_images"),
           count(lit(1)).as("n_rows"))

  /** A5 — global min/max over a raster feeding normalization (reference
    * `np.nanmin/np.nanmax`, regenerate_viirs_pngs.py:20-21). Null-skipping
    * like the NumPy nan-variants. */
  def globalMinMax(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.agg(min(valueCol).as("min_value"), max(valueCol).as("max_value"))

  /** A6 — grid resample: snap source pixels onto a coarser target grid and
    * average (reference export `scale=1000`, DataDownloader_V1.py:149).
    * `res` in the units of lon/lat. Snap-to-grid is an equi-key hash agg —
    * the scale-out path for regridding 100 TB of pixels. */
  def gridResample(df: DataFrame, res: Double,
                   lonCol: String = "lon", latCol: String = "lat",
                   valueCol: String = "value",
                   extraKeys: Seq[String] = Seq("band")): DataFrame = {
    val keys = extraKeys.map(col) ++ Seq(
      floor(col(lonCol) / res).cast("long").as("cell_x"),
      floor(col(latCol) / res).cast("long").as("cell_y"))
    df.groupBy(keys: _*).agg(avg(valueCol).as("mean_value"),
                             count(valueCol).as("n_px"))
  }

  /** A7 — geometry union of a feature collection, bbox flavor (reference
    * `punjab.geometry()`, DataDownloader_SNPP_VIIRS_V1.py:36; the reference
    * only ever consumes the bounding box — apply_mask=False everywhere). */
  def bboxUnion(df: DataFrame, lonCol: String = "lon",
                latCol: String = "lat"): DataFrame =
    df.agg(min(lonCol).as("min_lon"), min(latCol).as("min_lat"),
           max(lonCol).as("max_lon"), max(latCol).as("max_lat"))
}
