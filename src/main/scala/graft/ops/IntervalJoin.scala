package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J9 — interval containment join (points ⋈ intervals) without a nested
  * loop. Spark has no native range join: the naive
  * `points.join(intervals, ts between start and end)` compiles to
  * BroadcastNestedLoopJoin (quadratic, and a driver OOM once the
  * intervals side outgrows the broadcast threshold).
  *
  * The scale shape is time bucketing: each interval EXPLODES to the
  * fixed-width buckets it covers, each point belongs to exactly ONE
  * bucket, so a bucket equi-join enumerates every candidate pair exactly
  * once (no post-join dedup) and the exact containment predicate refines
  * map-side. Cost: one shuffle per side on the bucket key, intervals
  * replicated by their bucket span — pick `bucketMicros` near the typical
  * interval length so the replication factor stays O(1). Skew: a bucket's
  * population is points-per-bucket × intervals-overlapping-it, both
  * bounded by wall-clock density, not corpus size.
  */
object IntervalJoin {

  /** Join `points` (an integer-micros `tsCol`) to `intervals`
    * ([`startCol`, `endCol`] closed, integer micros) on containment.
    * Column sets must be disjoint apart from the join output's needs. */
  def pointsInIntervals(points: DataFrame, tsCol: String,
                        intervals: DataFrame, startCol: String,
                        endCol: String,
                        bucketMicros: Long = 3600L * 1000000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val pb = points.withColumn("__bucket", expr(s"$tsCol DIV $bucketMicros"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketMicros"),
                       expr(s"$endCol DIV $bucketMicros"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
