package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class CdcSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("CDC resynchronization: a front insertion perturbs only the " +
       "first chunk — every later chunk re-aligns") {
    import spark.implicits._
    val toks = (0 until 300).map(i => s"w${i % 97}")
    val a = toks.mkString(" ")
    val b = "inserted " + a
    val out = Dedup.cdcChunkDedup(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val (na, da) = (out(1L).getLong(1), out(1L).getLong(2))
    assert(na >= 5, s"too few chunks for the property to bite: $na")
    // all of A's chunks except (at most) the first are shared with B
    assert(da >= na - 1, s"resync failed: $da of $na chunks shared")
    // and B has exactly one extra/modified chunk's worth of difference
    val (nb, db) = (out(2L).getLong(1), out(2L).getLong(2))
    assert(nb - db <= 1, s"B diverged beyond the insertion: $db of $nb")
  }

  test("identical docs share every chunk; disjoint docs share none") {
    import spark.implicits._
    val a = (0 until 120).map(i => s"a${i}").mkString(" ")
    val c = (0 until 120).map(i => s"c${i}x").mkString(" ")
    val out = Dedup.cdcChunkDedup(
      Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == out(1L).getLong(1)) // all dup
    assert(out(2L).getLong(2) == out(2L).getLong(1))
    assert(out(3L).getLong(2) == 0L)                 // none dup
    assert(out(1L).getDouble(3) == 1.0 && out(3L).getDouble(3) == 0.0)
  }
}
