package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class SessionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, sec: Long, value: Double) =
    (id, user, sec * 1000000L, value)

  private def events = Seq(
    // user 1: two events 100 s apart, then a 1900 s gap (> 1800) → 2 sessions
    ev(1L, 1L, 0L, 1.0), ev(2L, 1L, 100L, 5.0),
    ev(3L, 1L, 2000L, 2.0), ev(4L, 1L, 2100L, 3.0),
    // user 2: single event
    ev(5L, 2L, 50L, 7.0),
    // user 3: gap of exactly 1800 s → still ONE session (strict >)
    ev(6L, 3L, 0L, 1.0), ev(7L, 3L, 1800L, 2.0)
  ).toDF("event_id", "user_id", "us", "value")
    .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("gap rule splits sessions, strict-greater boundary, per-user index") {
    val r = Sessions.sessionize(events, gapSec = 1800).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
         x.getDouble(6))).toMap
    assert(r.size == 4)
    assert(r((1L, 1L)) == ((2L, 0L, 100000000L, 100000000L, 5.0)))
    assert(r((1L, 2L)) == ((2L, 2000000000L, 2100000000L, 100000000L, 3.0)))
    assert(r((2L, 1L)) == ((1L, 50000000L, 50000000L, 0L, 7.0)))
    // 1800 s is NOT a session break — the rule is strictly greater-than
    assert(r((3L, 1L)) == ((2L, 0L, 1800000000L, 1800000000L, 2.0)))
  }

  test("session count is invariant to input partitioning") {
    val a = Sessions.sessionize(events.repartition(7), 1800).count()
    val b = Sessions.sessionize(events.coalesce(1), 1800).count()
    assert(a == 4 && b == 4)
  }
}
