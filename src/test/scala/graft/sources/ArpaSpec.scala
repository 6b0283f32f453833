package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class ArpaSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def model = Arpa.bigramModel(
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

  test("order-3 model: three sections, parse round trip, and a " +
    "wrong-arity gram row fails loud") {
    val tri = Arpa.Model(3, Vector(
      Map(Vector("a") -> ((-0.5, -0.2)), Vector("b") -> ((-0.7, 0.0))),
      Map(Vector("a", "b") -> ((-0.3, -0.1))),
      Map(Vector("a", "b", "a") -> ((-0.15, 0.0)))))
    val text = Arpa.render(tri)
    assert(text.contains("ngram 3=1\n"))
    assert(text.contains("\\3-grams:\n-0.150000000\ta b a\n"))
    assert(Arpa.parse(text) == tri)
    // a 2-word gram inside \3-grams: is a corrupt file, not data
    val bad = text.replace("-0.150000000\ta b a", "-0.150000000\ta b")
    val e = intercept[IllegalArgumentException] { Arpa.parse(bad) }
    assert(e.getMessage.contains("2-word gram"))
    // and whitespace-bearing tokens are unrepresentable, not silently
    // split on reload
    intercept[IllegalArgumentException] {
      Arpa.render(Arpa.bigramModel(Map("a b" -> ((-1.0, 0.0))), Map.empty))
    }
  }

  test("trained model round-trips through the file and the stored " +
    "score stays within the quantization of the inline score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the cat ran"),
      (2L, "a dog sat on a log"),
      (3L, "the cat sat on the log")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("arpa_spec")
      .resolve("m.arpa").toString
    Arpa.writeLevels(path, graft.ext.TextOps.knArpaLevels(docs, order = 2))
    val m = Arpa.read(path)
    // the streamed write and the driver render agree byte for byte
    assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8) == Arpa.render(m))
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
    Arpa.writeLevels(path, graft.ext.TextOps.knArpaLevels(train, order = 2))
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

  test("order-5 lifecycle: distributed write round-trips byte-" +
    "identically, every observed 5-gram is present, and the stored " +
    "score matches the inline knScore(5) under quantization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran off the mat"),
      (2L, "a dog sat on a log and a dog ran off a log"),
      (3L, "the cat sat on the log and the dog sat on the mat"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("arpa_spec5")
    val path = dir.resolve("m.arpa").toString
    Arpa.writeLevels(path, graft.ext.TextOps.knArpaLevels(docs, order = 5))
    val m = Arpa.read(path)
    assert(m.order == 5)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    assert(new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8) == Arpa.render(m))
    // write the parsed model back through the driver path: identical
    val path2 = dir.resolve("m2.arpa").toString
    Arpa.write(path2, m)
    assert(java.util.Arrays.equals(bytes,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))))
    // stored score vs the inline order-5 recursion: equal within the
    // 9-dp artifact quantization
    val stored = graft.ext.TextOps.knScoreStoredArpa(spark, docs, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inline = graft.ext.TextOps.knScore(docs, order = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    inline.foreach { case (id, v) =>
      assert(math.abs(stored(id) - v) / v < 1e-6,
        s"doc $id stored ${stored(id)} vs inline $v")
    }
    // every level-5 entry covers an observed 5-gram (no zeroprob rows
    // at the top), and every context of a 5-gram has a level-4 entry
    // carrying its backoff weight
    assert(m.grams(4).values.forall(_._1 > -99.0))
    m.grams(4).keys.foreach { g =>
      assert(m.grams(3).contains(g.take(4)), s"missing context ${g.take(4)}")
    }
  }

  test("vocab cap: <unk> absorbs the Zipf tail ahead of the census " +
    "and bounds every level table") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "a rare word appears once here only"),
      (3L, "the cat sat on the mat again and again"))
      .toDF("doc_id", "text")
    val full = graft.ext.TextOps.knArpaLevels(docs, order = 2)
    val capped = graft.ext.TextOps.knArpaLevels(docs, order = 2,
      vocabSize = 5)
    val fullVocab = full.head.count()
    val cappedVocab = capped.head.count()
    assert(cappedVocab <= 6L, // top-5 + <unk>
      s"capped vocab $cappedVocab")
    assert(cappedVocab < fullVocab)
    val words = capped.head.select("gram").collect()
      .map(_.getSeq[String](0).head).toSet
    assert(words.contains("<unk>"))
    // the capped model still scores (backoff-safe end to end)
    val dir = java.nio.file.Files.createTempDirectory("arpa_cap")
    val path = dir.resolve("m.arpa").toString
    Arpa.writeLevels(path, capped)
    val got = graft.ext.TextOps.knScoreStoredArpa(spark, docs, path)
    assert(got.count() == 3)
  }
}
