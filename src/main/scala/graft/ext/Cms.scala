package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.HashExprs

case class CmsBuf(counters: Array[Long])

/** Count-min sketch as a custom typed Aggregator (§2.10 UDAF surface)
  * over 64-bit keys — the frequency sketch a 100 TB pipeline uses to
  * find heavy-hitter tokens/URLs/n-grams in one pass with fixed memory
  * (Cormode & Muthukrishnan 2005), where an exact census would shuffle
  * the full token stream.
  *
  * Every step is an engine-portable published spec: row i of key x
  * increments `counters[i][splitmix64_mix(x + i·GOLDEN) mod width]` —
  * the same splitmix64 probe-stream construction as [[BloomAggregator]]
  * (GOLDEN is splitmix64's published increment), so any engine can
  * recompute the exact counter array. Merge is element-wise sum: partial
  * aggregation combines map-side and the shuffle carries one
  * depth×width array per partition, whatever the stream cardinality.
  *
  * Standard guarantees: `estimate(x) ≥ true_count(x)` always (each row's
  * counter sums the true count plus non-negative collision mass), and
  * `estimate(x) ≤ true_count(x) + εN` with probability 1−δ for
  * ε = e/width, δ = e^−depth.
  *
  * Reference: the reference pipeline's per-collection frequency scans
  * (`DataDownloader_V2.py:110-168` iterates collections counting bands)
  * are driver-side loops; at corpus scale the sketch replaces the exact
  * pass. */
class CmsAggregator(depth: Int, logWidth: Int)
    extends Aggregator[Long, CmsBuf, CmsBuf] {
  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(logWidth >= 1 && logWidth <= 20, s"logWidth out of range: $logWidth")
  private val width = 1 << logWidth

  override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

  override def reduce(buf: CmsBuf, key: Long): CmsBuf = {
    var i = 1
    while (i <= depth) {
      // wrapping key + i·GOLDEN, matching Bloom's probe stream
      val cell = java.lang.Math.floorMod(
        HashExprs.mix64(key + i * Cms.GOLDEN), width.toLong).toInt
      buf.counters((i - 1) * width + cell) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var j = 0
    while (j < a.counters.length) { a.counters(j) += b.counters(j); j += 1 }
    a
  }

  override def finish(buf: CmsBuf): CmsBuf = buf
  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
}

object Cms {

  /** splitmix64's published stream increment — row i hashes
    * `key + i·GOLDEN` through the engine's one mix64 finalizer, the same
    * construction [[Bloom]] uses for its probe bits. */
  final val GOLDEN = 0x9E3779B97F4A7C15L

  /** Aggregate `keys(keyCol)` into the depth×width counter array
    * (row-major). The sketch is the ONLY thing collected to the driver —
    * depth·width·8 bytes (32 KiB at the 4×1024 default), independent of
    * stream cardinality. Null keys carry no identity to count — excluded
    * symmetrically with [[Bloom.build]]. */
  def build(keys: DataFrame, keyCol: String,
            depth: Int = 4, logWidth: Int = 10): Array[Long] = {
    val agg = udaf(new CmsAggregator(depth, logWidth), Encoders.scalaLong)
    keys.filter(col(keyCol).isNotNull)
      .select(agg(col(keyCol).cast("long")).as("cms"))
      .head.getStruct(0).getAs[scala.collection.Seq[Long]]("counters").toArray
  }

  /** Point estimate as a pure codegen'd column: min over the depth rows
    * of the counter each row hashes the key into, read from the LITERAL
    * counter array (broadcast with the task binary — no join, no
    * shuffle). Mirrors [[Bloom.contains]]: mix64_add_col wraps the
    * key + i·GOLDEN addition natively so ANSI mode never overflows. */
  def estimate(counters: Array[Long], key: Column,
               depth: Int = 4, logWidth: Int = 10): Column = {
    val width = 1 << logWidth
    require(counters.length == depth * width,
      s"counter array length ${counters.length} != $depth x $width")
    val countersLit = lit(counters)
    (1 to depth).map { i =>
      val cell = pmod(HashExprs.mix64_add_col(key.cast("long"), i * GOLDEN),
        lit(width.toLong))
      element_at(countersLit, (cell + lit(((i - 1) * width).toLong) + lit(1L))
        .cast("int"))
    }.reduce(least(_, _))
  }

  /** Heavy-hitter report: the exact top-k keys by occurrence count,
    * annotated with the sketch's estimate for each — the standard
    * validation product (estimate ≥ exact always; the gap is the
    * collision mass the 32 KiB sketch pays for its fixed size). The
    * exact census here is the oracle surface; at 100 TB a user keeps
    * only the sketch and probes candidate keys.
    *
    * One aggregation pass builds the sketch (map-side partial arrays),
    * one builds the exact census; the top-k cut is a
    * TakeOrderedAndProject on the (count DESC, key ASC) total order and
    * the probe rides the literal array — no join anywhere. */
  def heavyHitters(keyed: DataFrame, keyCol: String, hashCol: String,
                   k: Int = 20, depth: Int = 4, logWidth: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counters = build(keyed, hashCol, depth, logWidth)
    keyed
      .groupBy(col(keyCol), col(hashCol))
      .agg(count(lit(1)).as("exact_count"))
      .select(col(keyCol), col("exact_count"),
        estimate(counters, col(hashCol), depth, logWidth).as("cms_estimate"))
      .orderBy(col("exact_count").desc, col(keyCol))
      .limit(k)
  }
}
