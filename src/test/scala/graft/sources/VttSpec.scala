package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class VttSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("parse: signature, short/long timings, ids, settings, NOTE/STYLE, " +
       "multi-line payloads, CRLF") {
    val vtt = "WEBVTT - some header text\r\n" +
      "\r\n" +
      "NOTE this block\r\nmust vanish entirely\r\n" +
      "\r\n" +
      "intro-cue-id\r\n" +
      "00:00.500 --> 00:02.000 align:start position:10%\r\n" +
      "first line\r\nsecond line\r\n" +
      "\r\n" +
      "STYLE\r\n::cue { color: red }\r\n" +
      "\r\n" +
      "01:02:03.250 --> 01:02:04.000\r\n" +
      "hour-scale cue\r\n"
    val cues = Vtt.parse(vtt)
    assert(cues.length == 2)
    assert(cues(0) == Vtt.Cue(0, 500L, 2000L, "first line\nsecond line"))
    assert(cues(1) ==
      Vtt.Cue(1, 3723250L, 3724000L, "hour-scale cue"))
  }

  test("cue id merely starting with NOTE is a cue, not a comment") {
    val vtt = "WEBVTT\n\nNOTES-on-intro\n00:00.000 --> 00:01.400\nhello\n" +
      "\nNOTE a real comment\n\n00:01.500 --> 00:02.000\nworld\n"
    val cues = Vtt.parse(vtt)
    assert(cues.map(_.text) == Seq("hello", "world"))
    assert(cues.map(_.idx) == Seq(0, 1))
  }

  test("parse: non-VTT input and malformed blocks drop, never throw") {
    assert(Vtt.parse("not a vtt").isEmpty)
    assert(Vtt.parse("").isEmpty)
    val partial = "WEBVTT\n\nbroken block without timing\njust text\n\n" +
      "00:00.000 --> 00:01.000\nok\n"
    val cues = Vtt.parse(partial)
    assert(cues.map(_.text) == Seq("ok"))
  }

  test("write → parse round trip, including >1h stamps") {
    val lateMs = 3 * 3600000L + 59 * 60000L + 59000L
    val in = Seq(
      Vtt.Cue(0, 0L, 1400L, "alpha beta"),
      Vtt.Cue(1, 1500L, 2900L, "gamma"),
      Vtt.Cue(2, lateMs, lateMs + 999L, "delta"))
    val out = Vtt.parse(Vtt.write(in))
    assert(out == in)
  }

  test("docs → vtt → cues equals the closed form") {
    import spark.implicits._
    val docs = Seq((5L, "A b c d e f g"), (6L, "one two"))
      .toDF("doc_id", "text")
    val cues = Vtt.parseDocVtts(Vtt.vttFromDocs(docs)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getString(5)))
    assert(cues.toSet == Set(
      (5L, 0, 0L, 1400L, 5, "a b c d e"),
      (5L, 1, 1500L, 2900L, 2, "f g"),
      (6L, 0, 0L, 1400L, 2, "one two")))
  }
}
