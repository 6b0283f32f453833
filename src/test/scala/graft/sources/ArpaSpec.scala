package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class ArpaSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def model = Arpa.Model(
    unigrams = Map(
      "the" -> (-0.5, -0.3),
      "cat" -> (-1.25, 0.0),       // never a history -> backoff omitted
      "sat" -> (-99.0, -0.125)),   // no continuation stat -> zeroprob
    bigrams = Map(
      ("the", "cat") -> (-0.1),
      ("cat", "sat") -> (-0.75)))

  test("render: header counts, sections, 9-dp values, optional backoff") {
    val text = Arpa.render(model)
    assert(text.startsWith("\\data\\\nngram 1=3\nngram 2=2\n"))
    assert(text.contains("\\1-grams:\n"))
    assert(text.contains("-0.500000000\tthe\t-0.300000000\n"))
    assert(text.contains("-1.250000000\tcat\n"))          // no 3rd field
    assert(text.contains("-99.000000000\tsat\t-0.125000000\n"))
    assert(text.contains("\\2-grams:\n"))
    assert(text.contains("-0.100000000\tthe cat\n"))
    assert(text.endsWith("\\end\\\n"))
  }

  test("parse . render is the identity on quantized values") {
    assert(Arpa.parse(Arpa.render(model)) == model)
  }

  test("a higher-order ARPA fails loud instead of misreading its rows " +
    "as bigrams") {
    val tri = Arpa.render(model).replace("\\end\\",
      "\\3-grams:\n-0.5\ta b c\n\n\\end\\")
    val e = intercept[IllegalArgumentException] { Arpa.parse(tri) }
    assert(e.getMessage.contains("unsupported ARPA order 3"))
    // and whitespace-bearing tokens are unrepresentable, not silently
    // split on reload
    intercept[IllegalArgumentException] {
      Arpa.render(Arpa.Model(Map("a b" -> ((-1.0, 0.0))), Map.empty))
    }
  }

  test("trained model round-trips through the file and the stored " +
    "score stays within the quantization of the inline score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the cat ran"),
      (2L, "a dog sat on a log"),
      (3L, "the cat sat on the log")).toDF("doc_id", "text")
    val m = graft.ext.TextOps.knBigramModel(docs)
    val path = java.nio.file.Files.createTempDirectory("arpa_spec")
      .resolve("m.arpa").toString
    Arpa.write(path, m)
    assert(Arpa.read(path) == m) // exact on quantized values
    val stored = graft.ext.TextOps.knScoreStoredArpa(spark, docs, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inline = graft.ext.TextOps.knBigramScore(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    inline.foreach { case (id, v) =>
      assert(math.abs(stored(id) - v) / v < 1e-6,
        s"doc $id stored ${stored(id)} vs inline $v")
    }
  }

  test("backoff route: an unseen bigram of seen words scores " +
    "bow(w1) * p_cont(w2), and unseen words hit the zeroprob floor") {
    import spark.implicits._
    val train = Seq(
      (1L, "the cat sat"), (2L, "the dog sat"), (3L, "a cat ran"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("arpa_spec2")
      .resolve("m.arpa").toString
    Arpa.write(path, graft.ext.TextOps.knBigramModel(train))
    val m = Arpa.read(path)
    // "dog ran": both words in vocab, bigram unseen -> backoff branch
    val held = Seq((9L, "dog ran"), (10L, "dog zzz"))
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.knScoreStoredArpa(spark, held, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected =
      1.0 / math.pow(10.0, m.unigrams("dog")._2 + m.unigrams("ran")._1)
    assert(math.abs(got(9L) - expected) < 1e-9,
      s"backoff score ${got(9L)} vs $expected")
    // unseen w2 falls to the -99 zeroprob -> enormous inverse
    assert(got(10L) > 1e9)
  }
}
