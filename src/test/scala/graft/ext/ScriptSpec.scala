package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ScriptSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("script profile: hand-computed mixed-script censuses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abc 水水 дд!"),   // 3 latin, 2 han, 2 cyr of 10 chars
      (2L, "12345 !!"),        // digits/punct are Common script → und
      (3L, "水"),              // han only
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.scriptProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 10L && r1.getLong(2) == 3L &&
      r1.getLong(3) == 2L && r1.getLong(4) == 2L)
    assert(r1.getDouble(5) == 0.3 && r1.getString(8) == "latin")
    assert(out(2L).getString(8) == "und")
    assert(out(3L).getString(8) == "han" && out(3L).getDouble(6) == 1.0)
    // null text → null counts ride through, dominant null-safe?
    assert(out(4L).isNullAt(1))
  }

  test("dominance tie-break follows the (count, name) total order") {
    import spark.implicits._
    // equal han and cyr counts, no latin: 'han' > 'cyrillic'
    val r = TextOps.scriptProfile(Seq((1L, "水д")).toDF("doc_id", "text"))
      .head()
    assert(r.getString(8) == "han")
  }
}
