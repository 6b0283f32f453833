package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.HashExprs

case class BloomBuf(words: Array[Long])

/** Bloom filter as a custom typed Aggregator (§2.10 UDAF surface) over
  * 64-bit keys — the membership sketch a 100 TB pipeline uses to subtract
  * a drop-list (near-dup ids, decontamination ids, opt-out lists) from a
  * corpus without shuffling the corpus against it.
  *
  * Every step is an engine-portable published spec: probe i of key x sets
  * bit `splitmix64_mix(x + i·GOLDEN) mod m` (the splitmix64 stream
  * construction — GOLDEN is its published increment), so any engine can
  * recompute the exact sketch. Merge is word-wise OR: partial aggregation
  * combines map-side and the shuffle carries one m-bit sketch per
  * partition, whatever the drop-list cardinality.
  *
  * Standard guarantees: no false negatives ever; false-positive rate
  * ~ (1 - e^(-kn/m))^k — at the [[Bloom.antiJoinWithBloom]] defaults
  * (m = 2^20, k = 4) a 65k-key drop-list false-positives at ~0.24%,
  * so the exact verify join downstream processes ~1/400th of the corpus.
  */
class BloomAggregator(mBits: Int, kProbes: Int)
    extends Aggregator[Long, BloomBuf, BloomBuf] {
  require(mBits >= 64 && (mBits & 63) == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  require(kProbes >= 1 && kProbes <= 16, s"kProbes out of range: $kProbes")

  override def zero: BloomBuf = BloomBuf(new Array[Long](mBits / 64))

  override def reduce(buf: BloomBuf, key: Long): BloomBuf = {
    var i = 1
    while (i <= kProbes) {
      val pos = java.lang.Math.floorMod(
        HashExprs.mix64(key + i * Bloom.GOLDEN), mBits.toLong).toInt
      buf.words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
    var j = 0
    while (j < a.words.length) { a.words(j) |= b.words(j); j += 1 }
    a
  }

  override def finish(buf: BloomBuf): BloomBuf = buf
  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  override def outputEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
}

object Bloom {

  /** splitmix64's published stream increment (the golden-ratio odd
    * constant) — probe i hashes `key + i·GOLDEN` through the same mix64
    * finalizer used everywhere else in the engine. */
  final val GOLDEN = 0x9E3779B97F4A7C15L

  /** Aggregate `keys(keyCol)` into the filter's word array. The sketch is
    * the ONLY thing collected to the driver — mBits/8 bytes (128 KiB at
    * the 2^20 default), independent of drop-list cardinality. */
  def build(keys: DataFrame, keyCol: String, mBits: Int, kProbes: Int): Array[Long] = {
    val agg = udaf(new BloomAggregator(mBits, kProbes), Encoders.scalaLong)
    // null keys never match any join key, so they contribute nothing to the
    // drop set — exclude them rather than let the primitive-Long encoder
    // coerce them into a spurious 0L probe
    keys.filter(col(keyCol).isNotNull)
      .select(agg(col(keyCol).cast("long")).as("bf"))
      .head.getStruct(0).getAs[scala.collection.Seq[Long]]("words").toArray
  }

  /** Membership test as a pure codegen'd column: k probe bits ANDed, each
    * `(word[pos >> 6] & (1 << (pos & 63))) != 0` against the LITERAL word
    * array (broadcast with the task binary — no join, no shuffle). The
    * variable bit shift routes through a 64-entry mask literal because
    * `shiftleft`'s amount must be a literal; `shiftright(pos, 6)` handles
    * the word index directly. */
  def contains(words: Array[Long], key: Column, mBits: Int, kProbes: Int): Column = {
    // ONE array Literal each, not array(lit, lit, …): a CreateArray of
    // 16384 child expressions would dominate analysis/codegen time and
    // re-evaluate per row; a Literal array is a single constant object
    val wordsLit = lit(words)
    val maskLit = lit((0 until 64).map(b => 1L << b).toArray)
    (1 to kProbes).map { i =>
      // WRAPPING key + i·GOLDEN inside the native expression: a Catalyst Add
      // throws ARITHMETIC_OVERFLOW under ANSI for |key| beyond ~5e17, while
      // BloomAggregator.reduce wraps — the two sides must agree over the
      // full 64-bit key range or membership gets false negatives/crashes
      val pos = pmod(HashExprs.mix64_add_col(key.cast("long"), i * GOLDEN),
        lit(mBits.toLong))
      val word = element_at(wordsLit, shiftright(pos, 6).cast("int") + lit(1))
      val mask = element_at(maskLit, pmod(pos, lit(64L)).cast("int") + lit(1))
      (word.bitwiseAND(mask)) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Drop-list subtraction with a Bloom pre-filter — exact anti-join
    * semantics at a fraction of the anti-join's cost. The corpus splits on
    * the sketch's verdict: definite non-members (the overwhelming
    * majority) pass through the codegen'd filter WITHOUT touching the
    * join; only Bloom-positive rows (true drops + the ~0.2% false
    * positives) reach the exact anti-join that removes the survivors'
    * false positives. No false negatives means the union is EXACTLY the
    * plain `corpus ANTI JOIN dropList` — the oracle runs the plain
    * subtraction, proving the rewrite loses and leaks nothing (the
    * j7-salted-join convention).
    *
    * 100 TB posture: the plain anti-join shuffles the full corpus when
    * the drop-list exceeds the broadcast threshold; here the corpus-side
    * shuffle shrinks to the Bloom-positive sliver, the sketch rides into
    * the scan stage as a 128 KiB literal, and the drop-list is read twice
    * (once reduced to the sketch, once into the sliver join). */
  def antiJoinWithBloom(corpus: DataFrame, dropList: DataFrame,
                        keyCol: String = "doc_id",
                        mBits: Int = 1 << 20, kProbes: Int = 4): DataFrame = {
    val words = build(dropList, keyCol, mBits, kProbes)
    // null-key rows: `cand` evaluates to NULL, which fails BOTH filter(cand)
    // and filter(!cand) — but a plain left_anti KEEPS null-key rows (a null
    // join key matches nothing). Route on coalesce(cand, false) so null-key
    // rows go straight to the kept side and the invariant
    // `result ≡ corpus ANTI JOIN dropList` holds on nullable keys.
    val cand = coalesce(contains(words, col(keyCol), mBits, kProbes), lit(false))
    corpus.filter(cand)
      .join(dropList.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(corpus.filter(!cand))
  }
}
