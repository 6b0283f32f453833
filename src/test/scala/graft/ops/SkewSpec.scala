package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.pipeline.Bucketing

class SkewSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // one hot key carrying 90% of the left side
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "row_id")
    val right = (1L to 101L).map(k => (k, s"v$k")).toDF("k", "payload")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", "row_id", nSalt = 8)
    assert(salted.count() == plain.count())
    // multiset equality via exceptAll both ways
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join tolerates a pre-existing __salt column on either side") {
    val left = (1 to 50).map(i => (1L, i, i % 3)).toDF("k", "row_id", "__salt")
    val right = (1L to 5L).map(k => (k, s"v$k", 9)).toDF("k", "payload", "__salt")
    val out = Skew.saltedJoin(left, right, "k", "row_id", nSalt = 4)
    assert(out.count() == 50) // k=1 matches all 50 left rows
    // caller's columns survive untouched (the join salt picked a fresh name)
    assert(out.columns.count(_ == "__salt") == 2)
    assert(out.select("payload").distinct().head.getString(0) == "v1")
  }

  test("salt spreads the hot key over multiple partitions") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "row_id")
    val salts = left
      .withColumn("salt", pmod(xxhash64(col("row_id")), lit(8)))
      .select("salt").distinct().count()
    assert(salts == 8) // every subkey used -> ~n/8 max partition load
  }

  test("bucketed tables join without any exchange") {
    val a = (1L to 500L).map(k => (k, k * 2)).toDF("k", "va")
    val b = (1L to 500L).map(k => (k, s"b$k")).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bucket_a", "k", buckets = 4)
    Bucketing.writeBucketed(b, "bucket_b", "k", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the co-location is what elides the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bucket_a", "bucket_b", "k")
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
