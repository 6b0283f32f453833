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

  private def funnelEvents = Seq(
    // user 1: signup at 100, purchase at 200 → converted
    (1L, 1L, 100L, "signup"), (2L, 1L, 200L, "purchase"),
    // user 2: purchase BEFORE signup only → not converted, to_us null
    (3L, 2L, 50L, "purchase"), (4L, 2L, 500L, "signup"),
    // user 3: purchase beyond the window → found but not converted
    (5L, 3L, 0L, "signup"), (6L, 3L, 2000L, "purchase"),
    // user 4: never signed up → excluded
    (7L, 4L, 10L, "purchase"),
    // user 5: purchase at exactly window edge → converted (≤)
    (8L, 5L, 0L, "signup"), (9L, 5L, 1000L, "purchase")
  ).toDF("event_id", "user_id", "sec", "event_type")
    .withColumn("ts", timestamp_micros(col("sec") * 1000000L)).drop("sec")

  test("conversion funnel: first-from, first-to-after, window edge, exclusions") {
    val r = Sessions.conversionFunnel(funnelEvents, "signup", "purchase",
        windowSec = 1000).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1),
         if (x.isNullAt(2)) None else Some(x.getLong(2)),
         x.getBoolean(3))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 5L))
    assert(r(1L) == ((100000000L, Some(200000000L), true)))
    assert(r(2L) == ((500000000L, None, false)))
    assert(r(3L) == ((0L, Some(2000000000L), false)))
    assert(r(5L) == ((0L, Some(1000000000L), true)))
  }
}
