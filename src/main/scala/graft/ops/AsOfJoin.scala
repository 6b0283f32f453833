package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime, per key. The natural alignment for the
  * reference's NRT fire feed against report periods (SURVEY §2.3 lists
  * as-of as the one join family the reference lacks; §7 names it the
  * obvious extension).
  *
  * Implementation is the union+window pattern, NOT a range join: tag both
  * streams, union, and carry the last right value forward with
  * last_value(ignoreNulls) over (key ORDER BY time, side). One shuffle on
  * (key), no O(n·m) inequality-join blowup — at 100 TB this is a single
  * sort-merge-shaped exchange, the same plan a native AsOfJoinExec would
  * produce, with skew handled by AQE like any other keyed window.
  */
object AsOfJoin {

  /** @param left      probe side (one output row per left row)
    * @param right     reference side (values carried forward)
    * @param keys      equi-key columns present in both
    * @param leftTime  event-time column name on left
    * @param rightTime event-time column name on right
    * @param valueCols right columns to carry (exposed as asof_<name>) */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    // side 0 = right (sorts before left at equal timestamps → "<=")
    val r = right.select(keyCols ++ Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
      valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val lAligned = l.select((l.columns.filterNot(valueCols.map("_v_" + _).contains)
      .map(col) ++ valueCols.map(c => lit(null).cast(
        r.schema(s"_v_$c").dataType).as(s"_v_$c"))): _*)
    val unioned = lAligned.unionByName(r.select(
      r.columns.map(col) ++ l.columns.filterNot(c =>
        keys.contains(c) || c == "_t" || c == "_side")
        .map(c => lit(null).cast(l.schema(c).dataType).as(c)): _*))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop("_t" +: "_side" +: valueCols.map("_v_" + _): _*)
  }
}
