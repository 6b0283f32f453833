package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class SketchSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("bloom: no false negatives ever, a saturated filter answers " +
    "all-maybe, a roomy one rejects most non-members, and the word " +
    "table is bounded by m/32") {
    // keys are upstream HASH OUTPUTS in production; raw arithmetic
    // progressions in GOLDEN would alias the additive seed family
    // (seed j of key i = seed j-1 of key i+GOLDEN), so scramble
    val members = (1L to 200L)
      .map(graft.functions.HashExprs.mix64).toDF("key")
    val nonMembers = (1001L to 1200L)
      .map(graft.functions.HashExprs.mix64).toDF("key")
    val m = 4096; val k = 3
    val words = Sketch.bloomBuild(members, "key", m, k)
    assert(words.count() <= m / 32)
    // the defining guarantee: a stored key NEVER reads absent
    val pm = Sketch.bloomProbe(members, words, "key", m, k).collect()
    assert(pm.length == 200 && pm.forall(_.getAs[Boolean]("maybe")),
      "false negative")
    // 32-bit filter under 200 keys: every bit set, membership signal
    // gone — the saturation failure mode, answered honestly as maybe
    val tiny = Sketch.bloomBuild(members, "key", 32, k)
    val pt = Sketch.bloomProbe(nonMembers, tiny, "key", 32, k).collect()
    assert(pt.forall(_.getAs[Boolean]("maybe")), "saturated filter")
    // the roomy filter rejects the bulk of non-members (600 of 4096
    // bits set -> per-probe FP ~0.3%)
    val rejected = Sketch.bloomProbe(nonMembers, words, "key", m, k)
      .filter(!col("maybe")).count()
    assert(rejected > 150,
      s"roomy filter rejected only $rejected of 200 non-members")
  }

  test("bloom: probing an empty filter is false (missing words are " +
    "unset bits, not errors)") {
    val words = Sketch.bloomBuild(Seq.empty[Long].toDF("key"), "key",
      1024, 3)
    assert(words.count() == 0)
    val p = Sketch.bloomProbe(Seq(42L).toDF("key"), words, "key",
      1024, 3).collect()
    assert(p.length == 1 && !p.head.getAs[Boolean]("maybe"))
  }

  test("count-min: one-sided (est >= exact) always, exact on a " +
    "collision-free layout, registers bounded by d*w, and linear in " +
    "multiplicity") {
    // term i appears exactly i times
    val occ = (1 to 20)
      .flatMap(i => Seq.fill(i)(graft.functions.HashExprs.mix64(i.toLong)))
      .toDF("key")
    val w = 1 << 16; val d = 3
    val regs = Sketch.countMinRegisters(occ, "key", w, d)
    assert(regs.count() <= d.toLong * w)
    val queries = (1 to 20)
      .map(i => (i, graft.functions.HashExprs.mix64(i.toLong)))
      .toDF("i", "key")
    def estimates(r: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      Sketch.countMinEstimate(queries, r, "key", w, d, keep = Seq("i"))
        .collect()
        .map(x => x.getAs[Int]("i") -> x.getAs[Long]("c_est")).toMap
    val est = estimates(regs)
    (1 to 20).foreach(i =>
      assert(est(i) >= i.toLong, s"under-count for term $i: ${est(i)}"))
    // 60 seed positions across 65536 buckets: the min row of every
    // term is collision-free here, so the estimate is exact
    (1 to 20).foreach(i =>
      assert(est(i) == i.toLong, s"term $i est ${est(i)}"))
    // doubling the stream doubles every register, hence every min
    val est2 = estimates(
      Sketch.countMinRegisters(occ.union(occ), "key", w, d))
    (1 to 20).foreach(i => assert(est2(i) == 2 * est(i)))
  }

  test("count-min: a crowded sketch overestimates light terms but " +
    "never underestimates — the one-sided error, priced") {
    // 512 distinct keys, one occurrence each, crammed into w = 16:
    // every bucket carries ~32 colliding keys per row
    val occ = (1L to 512L)
      .map(graft.functions.HashExprs.mix64).toDF("key")
    val regs = Sketch.countMinRegisters(occ, "key", 16, 3)
    val est = Sketch.countMinEstimate(occ, regs, "key", 16, 3)
      .collect().map(_.getAs[Long]("c_est"))
    assert(est.forall(_ >= 1L), "under-count")
    assert(est.max > 1L, "a crowded sketch must overestimate somewhere")
  }
}
