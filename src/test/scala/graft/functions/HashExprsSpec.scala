package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class HashExprsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def hashesDf = Seq(
    (1L, Seq(11L, -42L, 987654321L, 5L)),
    (2L, Seq(11L, -42L, 987654321L, 5L)), // identical set
    (3L, Seq(99L, 123L)),
    (4L, Seq.empty[Long])
  ).toDF("id", "hashes")

  test("minhash matches the Scala reference implementation") {
    val k = 8
    val rows = hashesDf.select(col("id"),
      HashExprs.min_hash(col("hashes"), k).as("sig")).collect()
    rows.foreach { r =>
      val in = hashesDf.filter(col("id") === r.getLong(0))
        .head.getAs[scala.collection.Seq[Long]]("hashes").toArray
      val expected = HashExprs.minhashRef(in, k).toSeq
      assert(r.getAs[scala.collection.Seq[Long]]("sig").toSeq == expected)
    }
  }

  test("simhash matches reference; identical inputs → identical fingerprints") {
    val fp = hashesDf.select(col("id"), HashExprs.sim_hash(col("hashes")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) == HashExprs.simhashRef(Array(11L, -42L, 987654321L, 5L)))
    assert(fp(4L) == 0L) // empty doc: all votes negative → 0
  }

  test("codegen and interpreted paths agree") {
    // force interpreted eval via the reference; codegen via the plan
    val viaPlan = hashesDf
      .select(HashExprs.sim_hash(col("hashes")).as("fp"),
              HashExprs.min_hash(col("hashes"), 4).as("sig"))
      .collect()
    val local = hashesDf.collect().map { r =>
      val in = r.getAs[scala.collection.Seq[Long]]("hashes").toArray
      (HashExprs.simhashRef(in), HashExprs.minhashRef(in, 4).toSeq)
    }
    viaPlan.zip(local).foreach { case (row, (fp, sig)) =>
      assert(row.getLong(0) == fp)
      assert(row.getAs[scala.collection.Seq[Long]](1).toSeq == sig)
    }
  }

  test("null input propagates to null output") {
    val df = Seq((1L, Some(Seq(1L, 2L))), (2L, None))
      .toDF("id", "hashes")
    val r = df.select(HashExprs.sim_hash(col("hashes")).as("fp")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("fnv1a64 matches the published test vectors") {
    assert(HashExprs.fnv1a64(Array.empty[Byte]) == 0xcbf29ce484222325L)
    assert(HashExprs.fnv1a64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  test("rolling FNV fingerprint: known value, order sensitivity, codegen=eval") {
    val df = Seq((1L, Seq("the", "quick", "fox")),
                 (2L, Seq("fox", "quick", "the")),
                 (3L, Seq.empty[String])).toDF("id", "toks")
    val got = df.select(col("id"),
        HashExprs.rolling_fnv_fingerprint(col("toks")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 7368246946192009564L)  // python-reference value
    assert(got(2L) == -1069032734625473145L) // reversed order differs
    assert(got(3L) == 0L)
    // interpreted eval (direct nullSafeEval) agrees with the codegen'd plan
    def interp(toks: Seq[String]): Long =
      RollingFnvFingerprint(org.apache.spark.sql.catalyst.expressions.Literal(1L))
        .nullSafeEval(new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
        .asInstanceOf[Long]
    assert(interp(Seq("the", "quick", "fox")) == got(1L))
    assert(interp(Seq("fox", "quick", "the")) == got(2L))
    assert(interp(Seq.empty) == got(3L))
  }
}
