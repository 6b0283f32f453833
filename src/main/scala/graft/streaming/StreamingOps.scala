package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** SURVEY §2.9 — the reference's NRT fire feed, restated as Structured
  * Streaming.
  *
  * The reference polls `NASA/LANCE/SNPP_VIIRS/C2` in batch and recomputes
  * each calendar window from scratch (complete-mode semantics,
  * DataDownloader_SNPP_VIIRS_V1.py:137-141, 220-238). Streaming-native
  * restatement: file source → event-time watermark → per-day window +
  * running max composite. All builtin stateful aggs — no custom StateStore.
  */
object StreamingOps {

  /** Daily max-composite over a streaming pixel/event feed with late-data
    * tolerance. `dateCol` must be a timestamp. */
  def dailyMaxStream(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     valueCol: String, watermark: String = "2 days"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), "1 day").as("day") +: keyCols.map(col)): _*)
      .agg(max(valueCol).as("max_value"), count(lit(1)).as("n"))

  /** Run a streaming aggregation over existing parquet as a bounded stream
    * (memory sink), for batch-equivalence testing. Returns the final table.
    */
  def runBounded(spark: SparkSession, agg: DataFrame, name: String,
                 mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q: StreamingQuery = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
