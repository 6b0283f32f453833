package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F3/F4 + §2.3 J3 — severity bucketing against per-band
  * standards.
  *
  * Reference semantics (DataDownloader_V3.py:63-73), lower-inclusive:
  *   x <  s          → "none"  (transparent)
  *   s ≤ x < 1.5 s   → "low"   (blue)
  *   1.5 s ≤ x < 2 s → "mid"   (green)
  *   x ≥ 2 s         → "high"  (red)
  * The per-band standard arrives via a broadcast hash join on `band`
  * (reference `standard_values.get(key)`, DataDownloader_V3.py:56,172-184) —
  * a handful of rows against billions of pixels: always broadcast.
  */
object Buckets {

  /** F3 — CASE-WHEN severity chain; `std` is a Column so it can come from a
    * joined dimension or a literal. Constant folding precomputes 1.5*s/2*s
    * when `std` is literal, exactly like the reference's precomputed dict. */
  def severity(value: Column, std: Column): Column =
    when(value < std, "none")
      .when(value < std * 1.5, "low")
      .when(value < std * 2.0, "mid")
      .otherwise("high")

  /** J3 — join pixels to the standards dimension (broadcast) and bucket. */
  def withSeverity(pixels: DataFrame, standards: DataFrame,
                   valueCol: String = "value"): DataFrame =
    pixels.join(broadcast(standards), Seq("band"))
      .withColumn("severity", severity(col(valueCol), col("std_value")))

  /** F4 — conditional recolor: rgba struct from a severity/positive mask
    * (reference regenerate_viirs_pngs.py:35-41 — fire pixels dark red,
    * alpha 1; background alpha 0). */
  def fireRgba(value: Column): Column =
    when(value > 0,
      struct(lit(139).as("r"), lit(0).as("g"), lit(0).as("b"), lit(255).as("a")))
    .otherwise(
      struct(lit(0).as("r"), lit(0).as("g"), lit(0).as("b"), lit(0).as("a")))
}
