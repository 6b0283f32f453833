package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 + §2.8 — per-raster min-max normalization and friends.
  *
  * The reference normalizes each raster by its own min/max
  * (`DataDownloader_V1.py:59-62`). Distributed restatement: an analytic
  * window over the raster key (`date`,`band`) with an unbounded frame — no
  * driver-side collect of min/max, stays fully parallel per partition.
  */
object Normalize {

  /** F1 — NaN→0 fill (reference `np.where(np.isnan(img),0,img)`,
    * regenerate_viirs_pngs.py:18). Engine rule: nodata is null, so
    * coalesce; nanvl guards genuine NaN doubles too. */
  def nanFill(c: Column, fill: Double = 0.0): Column =
    coalesce(nanvl(c, lit(fill)), lit(fill))

  /** W1 — per-partition min-max normalization with the reference's exact
    * epsilon guard: (x - min) / (max - min + 1e-6)
    * (DataDownloader_V1.py:62). */
  def minMaxNorm(valueCol: String, partitionCols: String*): Column = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    val mn = min(col(valueCol)).over(w)
    val mx = max(col(valueCol)).over(w)
    (col(valueCol) - mn) / (mx - mn + lit(1e-6))
  }

  /** W2 — zero-preserving normalization: only x>0 pixels are scaled; zeros
    * stay 0 = transparent (reference regenerate_viirs_pngs.py:24-28,
    * DataDownloader_SNPP_VIIRS_V1.py:77-82). The min/max are computed over
    * the POSITIVE subset, as the reference does with masked arrays. */
  def zeroPreservingNorm(valueCol: String, partitionCols: String*): Column = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    val pos = when(col(valueCol) > 0, col(valueCol))
    val mn = min(pos).over(w)
    val mx = max(pos).over(w)
    when(col(valueCol) > 0, (col(valueCol) - mn) / (mx - mn + lit(1e-6)))
      .otherwise(lit(0.0))
  }

  /** F6 — uint8 quantization with clamp (reference `(x*255).astype(uint8)`,
    * DataDownloader_V1.py:68). */
  def quantize255(c: Column): Column =
    least(greatest((c * 255.0).cast("int"), lit(0)), lit(255))

  /** F15 — epsilon-guarded division (reference `+1e-6` denominator,
    * `if max_val > min_val` guard, DataDownloader_SNPP_VIIRS_V1.py:202-205). */
  def guardedDiv(num: Column, den: Column, eps: Double = 1e-6): Column =
    num / (den + lit(eps))
}
