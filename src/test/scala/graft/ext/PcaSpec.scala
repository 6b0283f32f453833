package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class PcaSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val dim = 64

  /** Correlated fixture: v = B·z for a 4-dim latent z, B deterministic
    * with well-separated column scales (8, 4, 2, 1) — low-rank data
    * whose energy does NOT sit in any coordinate slice, the shape OPQ
    * rotations exist for. */
  private lazy val fixture: Seq[(Long, Array[Float])] = {
    var x = 0xBADC0FFEEL
    def next(): Double = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val b = Array.tabulate(4, dim)((c, i) =>
      next() * Array(8.0, 4.0, 2.0, 1.0)(c))
    (0 until 200).map { id =>
      val z = Array.fill(4)(next())
      val v = Array.tabulate(dim)(i =>
        (0 until 4).foldLeft(0.0)((a, c) => a + b(c)(i) * z(c)).toFloat)
      (id.toLong, v)
    }
  }

  private lazy val df = {
    import spark.implicits._
    fixture.toDF("vec_id", "embedding")
  }

  test("deflated top-3 axes: unit norm, mutually orthogonal, " +
       "λ descending, projection variance = Rayleigh quotient") {
    val (mu, axes, lambdas) = Similarity.pcaTopAxes(df, nComp = 3, dim = dim)
    def dot(a: Array[Double], b: Array[Double]): Double =
      (0 until dim).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    axes.foreach(w => assert(math.abs(dot(w, w) - 1.0) < 1e-9))
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(math.abs(dot(axes(i), axes(j))) < 1e-4,
        s"axes $i,$j not orthogonal: ${dot(axes(i), axes(j))}")
    assert(lambdas(0) >= lambdas(1) && lambdas(1) >= lambdas(2) &&
      lambdas(2) > 0.0)
    // per-axis projection variance over the fixture ≈ its λ
    val n = fixture.length.toDouble
    axes.zip(lambdas).foreach { case (w, lam) =>
      val projs = fixture.map { case (_, v) =>
        (0 until dim).foldLeft(0.0)((a, i) => a + v(i) * w(i)) - dot(mu, w)
      }
      val mean = projs.sum / n
      val varP = projs.map(p => (p - mean) * (p - mean)).sum / n
      assert(math.abs(varP - lam) < 1e-3 * math.max(1.0, lam),
        s"projection variance $varP != lambda $lam")
    }
  }

  test("OPQ hook: ANN recall@10 in the top-8 PCA subspace beats the " +
       "raw first-8 coordinate slice on correlated data") {
    val (mu, axes, _) = Similarity.pcaTopAxes(df, nComp = 8, dim = dim)
    val vecs = fixture.toArray
    def cosTop10(score: ((Long, Array[Float])) => Array[Double],
                 q: Array[Double]): Seq[Long] = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
        val na = math.sqrt(a.indices.foldLeft(0.0)((s, i) => s + a(i) * a(i)))
        val nb = math.sqrt(b.indices.foldLeft(0.0)((s, i) => s + b(i) * b(i)))
        if (na == 0 || nb == 0) -2.0 else d / (na * nb)
      }
      vecs.map(v => (v._1, cos(score(v), q)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    }
    val full: ((Long, Array[Float])) => Array[Double] =
      v => v._2.map(_.toDouble)
    val pca: ((Long, Array[Float])) => Array[Double] = v =>
      axes.map(w => (0 until dim).foldLeft(0.0)((a, i) =>
        a + (v._2(i) - mu(i)) * w(i)))
    val raw8: ((Long, Array[Float])) => Array[Double] =
      v => v._2.take(8).map(_.toDouble)
    // query = vector 7's representation in each space
    val q = vecs(7)
    val truth = cosTop10(full, full(q)).toSet
    val recallPca = cosTop10(pca, pca(q)).count(truth.contains)
    val recallRaw = cosTop10(raw8, raw8(q)).count(truth.contains)
    assert(recallPca >= recallRaw,
      s"rotated recall $recallPca < raw-slice recall $recallRaw")
    assert(recallPca >= 8, s"rotated subspace recall too low: $recallPca")
  }

  test("ABTT: removing the common direction restores cosine contrast " +
    "on an anisotropic cloud") {
    import spark.implicits._
    // anisotropic fixture: a common direction (axis 0) carries a huge
    // positive, VARYING component — it dominates both the mean (the
    // cosine cone) and the variance (so it IS the top principal
    // direction ABTT removes); the discriminative signal lives in the
    // remaining axes
    val aniso = fixture.map { case (id, v) =>
      (id, v.zipWithIndex.map { case (x, i) =>
        if (i == 0) 50.0f + 200.0f * (id % 3) else x })
    }
    val adf = aniso.toDF("vec_id", "embedding")
    // raw cosines all collapse toward 1 (everything looks like a
    // near-dup of everything); the corrected ranking must not
    val rawIso = Similarity.isotropyReport(adf).head
    assert(rawIso.getAs[Double]("mean_cos_to_mu") > 0.9)
    val q = aniso(7)._2.map(_.toDouble)
    val corrected = Similarity.abttTopK(adf, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cos")))
    // the query's own corrected representation is its best match...
    assert(corrected.head._1 == 7L)
    // ...and the corrected neighborhood recovers the cone-free truth:
    // cosine over the mean-centered data with the common axis dropped
    def c(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val muRest = Array.tabulate(dim)(i =>
      aniso.map(_._2(i).toDouble).sum / aniso.length)
    def rest(v: Array[Float]): Array[Double] =
      Array.tabulate(dim)(i =>
        if (i == 0) 0.0 else v(i) - muRest(i))
    val qr = rest(aniso(7)._2)
    val truth = aniso.map(v => (v._1, c(rest(v._2), qr)))
      .sortBy { case (id, cc) => (-cc, id) }.take(10).map(_._1).toSet
    val got = corrected.map(_._1).toSet
    // raw (uncorrected) cosine ranks by cone position, not content
    val rawTop = aniso.map(v => (v._1,
        c(v._2.map(_.toDouble), aniso(7)._2.map(_.toDouble))))
      .sortBy { case (id, cc) => (-cc, id) }.take(10).map(_._1).toSet
    val gotRecall = got.intersect(truth).size
    val rawRecall = rawTop.intersect(truth).size
    assert(gotRecall > rawRecall,
      s"ABTT ($gotRecall) must beat raw cosine ($rawRecall) on the cone")
    // the trained axis is a close (not exact) e0, so allow tilt slack
    assert(gotRecall >= 5,
      s"ABTT recall vs cone-free truth too low: $got vs $truth")
  }
}
