package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class HllBuf(regs: Array[Byte])
case class HllRes(estimate: Double, n_zero: Int, reg_sum: Long)

/** HyperLogLog as a custom typed Aggregator (§2.10 UDAF surface) over
  * 64-bit hashes, with every step a published, engine-portable spec
  * (Flajolet et al. 2007) — unlike `approx_count_distinct`, whose HLL++
  * register layout is Spark-internal, this sketch is recomputable by any
  * engine, so the x16 profile is oracle-checkable:
  *
  *  - bucket = top `p` bits of the (unsigned) hash; m = 2^p registers
  *  - rho = leading-zero count of the remaining 64-p bits, + 1 (55 max
  *    at p=10, for an all-zero tail)
  *  - register[j] = max rho seen in bucket j; merge = elementwise max
  *  - raw estimate = alpha_m * m² / Σ 2^-reg[j] — the harmonic sum is
  *    computed EXACTLY as an integer (Σ 2^(55-reg[j]) ≤ m·2^55 fits well
  *    inside 128 bits, accumulated here as BigInt), so the estimate is a
  *    single deterministic division, identical across engines and
  *    aggregation orders
  *  - small-range correction (the published linear-counting branch):
  *    when the raw estimate ≤ 2.5m and empty registers remain, estimate =
  *    m·ln(m/V). ln()'s last ulp varies by libm, so consumers comparing
  *    across engines round the estimate (x16 rounds to 6dp — the same
  *    convention as the Mercator/cosine queries); reg_sum and n_zero pin
  *    the full register state exactly.
  *
  * Scale: the buffer is m bytes per group (1 KiB at p=10) regardless of
  * input cardinality; partial aggregation merges by max, so the shuffle
  * carries one sketch per (partition, group). */
class HllAggregator(p: Int = 10) extends Aggregator[Long, HllBuf, HllRes] {
  private val m = 1 << p
  private val maxRho = 64 - p + 1

  override def zero: HllBuf = HllBuf(new Array[Byte](m))

  override def reduce(buf: HllBuf, hash: Long): HllBuf = {
    val bucket = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rho = math.min(maxRho, java.lang.Long.numberOfLeadingZeros(w) + 1)
    if (rho > buf.regs(bucket)) buf.regs(bucket) = rho.toByte
    buf
  }

  override def merge(a: HllBuf, b: HllBuf): HllBuf = {
    var j = 0
    while (j < m) {
      if (b.regs(j) > a.regs(j)) a.regs(j) = b.regs(j)
      j += 1
    }
    a
  }

  override def finish(buf: HllBuf): HllRes = {
    var num = BigInt(0) // Σ 2^(maxRho - reg[j]), exact
    var zeros = 0
    var regSum = 0L
    var j = 0
    while (j < m) {
      val r = buf.regs(j) & 0xFF
      num += BigInt(1) << (maxRho - r)
      if (r == 0) zeros += 1
      regSum += r
      j += 1
    }
    val raw = HllAggregator.alphaM2K(p) / num.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    HllRes(est, zeros, regSum)
  }

  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[HllRes] = Encoders.product[HllRes]
}

object HllAggregator {
  /** alpha_m · m² · 2^(64-p+1) as one double constant, so the estimate is
    * a single division by the exact integer harmonic numerator. alpha_m =
    * 0.7213/(1 + 1.079/m) (published constant for m ≥ 128). */
  def alphaM2K(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1 + 1.079 / m) * m * m * math.pow(2.0, 64 - p + 1)
  }
}
