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
}
