package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Encoders, functions => F}

import graft.SharedSpark

class HdrSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val agg = new HdrQuantileAggregator(5)

  private def bucketOf(v: Long): Int = {
    // mirror of the private kernel via reduce on a fresh buffer
    val b = agg.reduce(agg.zero, v)
    b.counts.indexWhere(_ > 0L)
  }

  test("bucket map is monotone; lowerBound inverts it within 2^-5") {
    var x = 0xDEADBEEFL
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    var prevB = -1
    (0L to 40L).foreach { v =>
      val b = bucketOf(v)
      assert(b >= prevB, s"not monotone at $v")
      prevB = b
      if (v < 32) assert(agg.lowerBound(b) == v) // small values exact
    }
    (0 until 3000).foreach { _ =>
      val v = math.abs(next()) % 2000000L
      val b = bucketOf(v)
      val lb = agg.lowerBound(b)
      assert(lb <= v, s"lb $lb > v $v")
      assert(v.toDouble < lb * (1.0 + 1.0 / 32.0) + 1e-9,
        s"relative error bound violated: v=$v lb=$lb")
    }
  }

  test("sketch quantiles: exact rank, bounded relative value error, " +
       "partitioning-independent") {
    import spark.implicits._
    var x = 0x1234CAFEL
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    // skewed mixture: small exact values + heavy tail
    val vals = (0 until 5000).map { i =>
      if (i % 3 == 0) math.abs(next()) % 30
      else math.abs(next()) % 100000
    }.map(_.toLong)
    val hdr = F.udaf(new HdrQuantileAggregator(5), Encoders.scalaLong)
    def run(parts: Int) =
      vals.toDF("v").repartition(parts)
        .agg(hdr(F.col("v")).as("q")).select("q.*").head()
    val r = run(7)
    // deterministic under any partitioning — bit-equal rows
    assert(r == run(1) && r == run(32))
    assert(r.getAs[Long]("n") == 5000L)
    // exact-rank truth at the same integer-ceiled ranks
    val sorted = vals.sorted
    val n = sorted.length.toLong
    val truth = Seq((n + 3) / 4, (n + 1) / 2, (3 * n + 3) / 4,
      (19 * n + 19) / 20).map(rk => sorted((rk - 1).toInt))
    val est = Seq(r.getAs[Long]("q25"), r.getAs[Long]("q50"),
      r.getAs[Long]("q75"), r.getAs[Long]("q95"))
    est.zip(truth).foreach { case (qhat, q) =>
      assert(qhat <= q, s"sketch over-reports: $qhat > $q")
      assert(q.toDouble < qhat * (1.0 + 1.0 / 32.0) + 1e-9,
        s"relative bound violated: qhat=$qhat q=$q")
    }
  }
}
