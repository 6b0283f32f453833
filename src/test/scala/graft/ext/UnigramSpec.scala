package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Unigram-LM (hard-EM) tokenizer kernel pins. The full trainer replay
  * is oracle-guarded (x196/x197); these cases pin the deterministic
  * rules the replay depends on: the Viterbi tie-break, zero-count
  * pruning with the single-char floor, the scaled-integer log-probs,
  * and the fertility surface. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def lnS(c: Long, t: Long): Long = {
    val x = math.log(c.toDouble / t.toDouble) * 1e9
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
  }

  test("viterbi: max-score path; exact-tie takes the smallest last piece") {
    // "ab" vs "a"+"b" tie exactly at -20 under integer scores
    val lp = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    val got = Unigram.viterbi("ab", lp, maxPieceLen = 4)
    assert(got == Seq("b", "a")) // backtrack order; 2 pieces, not "ab"
    // strictly better single piece wins
    val lp2 = Map("a" -> -10L, "b" -> -10L, "ab" -> -19L)
    assert(Unigram.viterbi("ab", lp2, 4) == Seq("ab"))
  }

  test("viterbi: unreachable word falls back to one piece per char") {
    val lp = Map("a" -> -1L)
    assert(Unigram.viterbi("axa", lp, 4) == Seq("a", "x", "a"))
  }

  test("train: hand-checked EM — whole-word piece wins, unused multis " +
    "pruned, single chars floored at 1") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = Unigram.train(docs)
    // census: aaab x3. Round 1 viterbi picks the whole-word seed piece;
    // every other multi-char seed counts 0 and is pruned; a/b floor at 1.
    assert(got == Seq(
      ("a", 1L, lnS(1, 5)),
      ("aaab", 3L, lnS(3, 5)),
      ("b", 1L, lnS(1, 5))))
  }

  test("report: fertility over the trained table; empty-token docs drop") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab"), (3L, " "))
      .toDF("doc_id", "text")
    val v = Unigram.train(docs.filter(col("doc_id") =!= 3L))
    val r = Unigram.report(docs, v).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_pieces"),
         x.getAs[Double]("fertility"))).toMap
    assert(r.size == 2)
    assert(r(1L) == ((2L, 2L, 1.0)) && r(2L) == ((1L, 1L, 1.0)))
  }

  test("census bounds: minCount=1 is bit-identical to the unbounded " +
    "trainer; a Zipf-tail cut and a top-M cap shrink the vocabulary " +
    "deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha alpha beta"),
      (2L, "beta gamma delta epsilon"),
      (3L, "alpha alphabet betamax zeta")).toDF("doc_id", "text")
    val base = Unigram.train(docs)
    assert(Unigram.train(docs, minCount = 1L) == base)
    assert(Unigram.train(docs, minCount = 1L, maxCensusWords = 0) == base)
    // minCount=2 drops the singleton words from the census entirely:
    // chars appearing ONLY in dropped words (like 'x' of betamax or
    // 'd' of delta) cannot appear in the vocabulary
    val cut = Unigram.train(docs, minCount = 2L)
    assert(!cut.exists(_._1 == "x") && !cut.exists(_._1 == "d"))
    assert(cut.exists(_._1 == "a")) // alpha (x4) survives the cut
    // top-M cap: census of the 2 most frequent words only
    val capped = Unigram.train(docs, maxCensusWords = 2)
    // alpha x4 and beta x3 are the top 2; gamma's 'g' and 'm' vanish
    assert(capped.exists(_._1 == "alpha") || capped.exists(_._1 == "a"))
    assert(!capped.exists(_._1 == "g"))
    // both bounded runs are themselves deterministic under repartition
    assert(Unigram.train(docs.repartition(5), minCount = 2L) == cut)
    assert(Unigram.train(docs.repartition(5), maxCensusWords = 2) == capped)
  }

  test("train is vocabulary-deterministic: repeated runs bit-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta gamma delta"),
      (3L, "alpha alphabet betamax")).toDF("doc_id", "text")
    val a = Unigram.train(docs)
    val b = Unigram.train(docs.repartition(7))
    assert(a == b && a.nonEmpty)
    // single chars never pruned: every distinct char survives
    val chars = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .flatten.toSet
    assert(chars.forall(c => a.exists(_._1 == c.toString)))
  }
}
