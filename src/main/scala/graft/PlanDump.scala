package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds
  * (`plans/r<N>/<query>_<tag>.txt`).
  *
  * Usage: `runMain graft.PlanDump <outDir> <tag> <query>[,<query>...]`
  * Runs at sf0.001 so eagerly-materializing queries (checkpointed loops,
  * stored-artifact builds) stay cheap; plan SHAPE is sf-independent.
  * NOTE: queries that localCheckpoint internally show only the tail of
  * their DAG here (the loop body executes at plan time) — loop-internal
  * shapes are pinned by PlanSpec/GraphSpec assertions instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val Array(outDir, tag, names) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sf)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
