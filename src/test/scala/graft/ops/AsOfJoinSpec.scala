package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("as-of join: latest right row at or before each left time, per key") {
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L), (4L, "u2", 15L))
      .toDF("id", "key", "t")
    val right = Seq(
      ("u1", 8L, 100.0), ("u1", 15L, 200.0), ("u2", 15L, 300.0), ("u3", 1L, 9.0))
      .toDF("key", "t", "v")
    val r = AsOfJoin.asof(left, right, Seq("key"), "t", "t", Seq("v"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(r(1L) == Some(100.0)) // t=10 → right t=8
    assert(r(2L) == Some(200.0)) // t=20 → right t=15
    assert(r(3L) == None)        // t=5 → nothing yet
    assert(r(4L) == Some(300.0)) // equal timestamps: inclusive (<=)
  }

  test("as-of join plan: one shuffle on the key, no range-join blowup") {
    val left = Seq((1L, "u1", 10L)).toDF("id", "key", "t")
    val right = Seq(("u1", 8L, 1.0)).toDF("key", "t", "v")
    val plan = AsOfJoin.asof(left, right, Seq("key"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), s"range-join blowup:\n$plan")
  }
}
