package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class HdrBuf(counts: Array[Long])
case class HdrRes(n: Long, n_buckets: Int,
                  q25: Long, q50: Long, q75: Long, q95: Long)

/** Quantile sketch as a custom typed Aggregator (§2.10 UDAF surface,
  * the quantile member of the sketch tier next to [[HllAggregator]] /
  * CMS / Bloom): an HDR histogram (Gil Tene's High Dynamic Range
  * histogram — hdrhistogram.org; the same exponent-plus-mantissa
  * bucketing as DDSketch's log buckets, Masson et al., VLDB 2019, but
  * in PURE INTEGER arithmetic) over non-negative longs.
  *
  * Bucketing with `k` sub-bucket bits (k = 5 here):
  *  - `v < 2^k` → bucket `v` (small values exact);
  *  - else with `e = floor(log2 v)`: bucket `(e−k+1)·2^k + (v >> (e−k))
  *    − 2^k` — the exponent and the top `k+1` bits of the mantissa.
  *  The map v → bucket is monotone, so bucket order is value order, and
  *  each bucket's span is `[lb, lb·(1+2^−k))`: reported quantiles carry
  *  a guaranteed ≤ 2^−k (3.1%) RELATIVE value error at EXACT rank.
  *
  * Why this sketch and not GK/KLL: those summaries are insertion- and
  * merge-order dependent, so their state (and estimates) change with
  * partitioning — unverifiable under this repo's bit-exact oracle
  * discipline. HDR bucket counts are plain sums: deterministic under
  * ANY aggregation order, mergeable by vector addition (map-side
  * partials collapse), and the DuckDB oracle recomputes the census and
  * rank walk with the same integer algebra, no tolerance needed.
  *
  * Quantile rule (the x25 discipline, integer-ceiled): the value at
  * rank `ceil(p·n)` in value order — here the LOWER BOUND of the bucket
  * containing that rank, computed by a cumulative walk over the ≤1,888
  * buckets. Scale: buffer is 14.8 KiB per group regardless of input
  * cardinality; the rank walk is over buckets, not rows — x25's
  * per-group total sort of the corpus becomes a bounded in-sketch scan.
  */
class HdrQuantileAggregator(k: Int = 5)
    extends Aggregator[Long, HdrBuf, HdrRes] {
  private val small = 1 << k
  // max exponent for a positive Long is 62 → highest bucket index
  // (62−k+1)·2^k + (2^k − 1); size one past it
  private val size = ((63 - k) << k) + small

  private def bucketOf(v: Long): Int =
    if (v < small) math.max(0, v).toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (((e - k + 1) << k) + ((v >> (e - k)) - small)).toInt
    }

  /** Lower bound (= representative value) of a bucket — exact integer
    * inverse of [[bucketOf]]'s monotone map. */
  def lowerBound(b: Int): Long =
    if (b < small) b.toLong
    else (small.toLong + (b & (small - 1))) << ((b >> k) - 1)

  override def zero: HdrBuf = HdrBuf(new Array[Long](size))

  override def reduce(buf: HdrBuf, v: Long): HdrBuf = {
    buf.counts(bucketOf(v)) += 1L
    buf
  }

  override def merge(a: HdrBuf, b: HdrBuf): HdrBuf = {
    var i = 0
    while (i < size) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def finish(buf: HdrBuf): HdrRes = {
    var n = 0L
    var nb = 0
    var i = 0
    while (i < size) {
      val c = buf.counts(i)
      if (c > 0) { n += c; nb += 1 }
      i += 1
    }
    if (n == 0L) return HdrRes(0L, 0, -1L, -1L, -1L, -1L)
    // integer-exact ceil(p·n) ranks: 1/4, 1/2, 3/4, 19/20
    val ranks = Array((n + 3) / 4, (n + 1) / 2, (3 * n + 3) / 4,
      (19 * n + 19) / 20)
    val out = new Array[Long](4)
    var cum = 0L
    var r = 0
    i = 0
    while (i < size && r < 4) {
      val c = buf.counts(i)
      if (c > 0) {
        cum += c
        while (r < 4 && cum >= ranks(r)) { out(r) = lowerBound(i); r += 1 }
      }
      i += 1
    }
    HdrRes(n, nb, out(0), out(1), out(2), out(3))
  }

  override def bufferEncoder: Encoder[HdrBuf] = Encoders.product[HdrBuf]
  override def outputEncoder: Encoder[HdrRes] = Encoders.product[HdrRes]
}
