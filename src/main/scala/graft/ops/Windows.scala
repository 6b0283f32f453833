package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.9 — calendar-month tumbling windows.
  *
  * The reference's driver loop iterates `(month_start, month_end)` pairs with
  * relativedelta month arithmetic (DataDownloader_V2.py:170-183) — months are
  * variable-length, so the engine uses `date_trunc("month", …)`, never a
  * fixed-duration `window()`.
  */
object Windows {

  /** Month bucket key. */
  def monthOf(c: Column): Column = date_trunc("month", c)

  /** F10 — month-end computation: `start + 1 month - 1 day`
    * (reference DataDownloader_V2.py:176). */
  def monthEnd(c: Column): Column = last_day(c.cast("date"))

  /** Tumbling calendar-month aggregate over an event-time column. */
  def monthlyAgg(df: DataFrame, tsCol: String, keys: Seq[String],
                 aggs: Seq[Column]): DataFrame =
    df.groupBy((monthOf(col(tsCol)).as("month") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Centered moving mean over an ordered series — the temporal smoothing
    * pass a monthly composite pipeline runs before trend display (the
    * reference's viewer shows raw monthly layers; any anomaly/trend
    * product needs the smoothed baseline). Frame is ±halfWidth ROWS per
    * key, so feed a DENSE series (compose with [[gapFillMonths]] when
    * months can be missing); edges average over the truncated frame.
    *
    * Numerically engine-portable: values route through DECIMAL(28,6) (the
    * [[graft.Stable]] convention — exact for ≤6dp inputs like money/
    * composite sums), the frame sum is exact decimal arithmetic
    * (order-independent), and the single double division at the end is
    * correctly-rounded IEEE — so smoothed values replay bit-equal in any
    * engine. One window exchange on the key. */
  def centeredMovingMean(df: DataFrame, keyCol: String, orderCol: String,
                         valueCol: String, halfWidth: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-halfWidth, halfWidth)
    df.withColumn("smoothed",
      sum(col(valueCol).cast(DecimalType(28, 6))).over(w).cast("double")
        / count(col(valueCol)).over(w))
  }

  /** Temporal gap-fill with linear interpolation — the raster-time-series
    * step the reference pipeline needs when a month has no usable
    * acquisitions (cloud cover, sensor outage): its monthly loop
    * (DataDownloader_V2.py:170-183) simply skips empty months, leaving
    * holes downstream consumers must handle. This op densifies each
    * series to every calendar month between its first and last
    * observation and fills holes from the bracketing observations:
    *
    *  - interior hole: linear interpolation in month index
    *    `v = pv + (nv - pv) · (mi - pm)/(nm - pm)` — exact IEEE, engine-
    *    portable parenthesization;
    *  - leading/trailing hole: nearest-edge carry (no extrapolation).
    *
    * Input: one row per (key, month, value); month is any date/timestamp
    * in the month. Output: (key, month [first-of-month], value, observed).
    *
    * Shape: one aggregation for per-key [lo, hi] bounds, a generate for
    * the dense grid, a left join of observations, and ONE window exchange
    * on the key (all four frame variants share the partition/order).
    * Series length bounds the window partition (hundreds of months), so
    * skew is impossible; at 100 TB the key count is the parallelism. */
  def gapFillMonths(df: DataFrame, keyCol: String, monthCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mi = (year(col(monthCol)) * 12 + month(col(monthCol)) - 1).as("mi")
    val base = df.select(col(keyCol), mi, col(valueCol).cast("double").as("v"))
    val grid = base.groupBy(keyCol)
      .agg(min("mi").as("lo"), max("mi").as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"))).as("mi"))
    val past = Window.partitionBy(keyCol).orderBy("mi")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(keyCol).orderBy("mi")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(base, Seq(keyCol, "mi"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(past))
      .withColumn("pm", last(when(col("v").isNotNull, col("mi")),
        ignoreNulls = true).over(past))
      .withColumn("nv", first("v", ignoreNulls = true).over(future))
      .withColumn("nm", first(when(col("v").isNotNull, col("mi")),
        ignoreNulls = true).over(future))
      .withColumn("value",
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              ((col("mi") - col("pm")).cast("double") /
               (col("nm") - col("pm")).cast("double")))
          .otherwise(coalesce(col("pv"), col("nv"))))
      .withColumn("month",
        make_date(expr("mi DIV 12"), pmod(col("mi"), lit(12)) + 1, lit(1)))
      .withColumn("observed", col("v").isNotNull)
      .select(col(keyCol), col("month"), col("value"), col("observed"))
  }
}
