package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class CleanseSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Cleanse.normalizeText(col("t"))).head.getString(0)

  test("normalizeText composes NFC, strips controls/NBSP, collapses runs") {
    // decomposed e + combining acute (U+0301) → composed é
    assert(norm("café") == "café")
    // already-NFC text passes through untouched
    assert(norm("café") == "café")
    // tab, CR, LF, vertical tab, NBSP, DEL → spaces, runs collapsed, trimmed
    assert(norm(" a\t\tb\r\ncd ef  g ") == "a b c d e f g")
    assert(norm("") == "")
    assert(norm("   \t  ") == "")
  }

  test("NfcNormalize: interpreted eval agrees with the codegen'd plan") {
    import org.apache.spark.unsafe.types.UTF8String
    val inputs = Seq("caf\u00e9", "cafe\u0301", "", "plain ascii",
      "A\u030a ring", "\ufb01 ligature stays under NFC")
    inputs.foreach { s =>
      val viaEval = graft.functions.NfcNormalize
        .nfc(UTF8String.fromString(s)).toString
      val viaPlan = Seq(s).toDF("t")
        .select(graft.functions.NfcNormalize(col("t"))).head.getString(0)
      assert(viaEval == viaPlan)
      assert(viaPlan == java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  test("normalizeText makes NFC-variant texts exact-dedup equal") {
    val df = Seq((1L, "café au lait"), (2L, "café au lait"))
      .toDF("doc_id", "text")
      .withColumn("text", Cleanse.normalizeText(col("text")))
    assert(Dedup.exact(df).count() == 1) // one content class after NFC
  }

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Cleanse.redactPii(col("t"))).head.getString(0)

  test("redactPii scrubs emails, IPv4, and international phones") {
    assert(redact("mail bob.smith+x@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(redact("host 192.168.001.1 down") == "host <IP> down")
    assert(redact("call +1 (202) 555-0143 or +44 20/7946 0958.") ==
      "call <PHONE> or <PHONE>.")
    // bare digit runs are NOT phones (documented policy: too ambiguous)
    assert(redact("order 1234567 shipped in 2024") ==
      "order 1234567 shipped in 2024")
    // an email's digits must not be half-eaten by the phone pass
    assert(redact("a +331234567890b c user123456789@x.io") ==
      "a <PHONE>b c <EMAIL>")
  }

  test("removeBoilerplateLines drops corpus-frequent lines, keeps order") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha content one\n$boiler\nalpha content two"),
      (2L, s"$boiler\nbeta body"),
      (3L, s"gamma text\n$boiler"),
      (4L, boiler), // document that is ONLY boilerplate
      (5L, "delta unique\nepsilon unique")
    ).toDF("doc_id", "text")
    val r = Cleanse.removeBoilerplateLines(docs, minDf = 3L)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("alpha content one\nalpha content two", 3L, 2L)))
    assert(r(2L) == (("beta body", 2L, 1L)))
    assert(r(3L) == (("gamma text", 2L, 1L)))
    assert(r(4L) == (("", 1L, 0L))) // row survives with empty text
    assert(r(5L) == (("delta unique\nepsilon unique", 2L, 2L)))
  }

  test("removeBoilerplateLines counts in-doc repeats once toward df") {
    val docs = Seq(
      (1L, "x\nx\nx\nbody one"), // 'x' three times in ONE doc: df contribution 1
      (2L, "body two")
    ).toDF("doc_id", "text")
    val r = Cleanse.removeBoilerplateLines(docs, minDf = 2L)
    // df('x') = 1 < 2 → nothing removed
    assert(r.agg(sum("n_kept")).head.getLong(0) == 5L)
  }
}
