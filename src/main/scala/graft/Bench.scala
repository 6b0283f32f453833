package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: one JSON line with per-query wall time at
  * SPARK_GRAFT_SF_DIR. Queries run in sorted name order (deterministic
  * cross-run comparisons); a warmup action absorbs JVM/codegen start-up so
  * the first measured query isn't charged for it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT the codegen, parquet-reader, and hash-agg paths the
    // measured queries exercise (not charged to any query)
    spark.range(10000000L).selectExpr("sum(id)").collect()
    try Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
