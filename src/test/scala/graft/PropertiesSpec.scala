package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops._

/** SURVEY §5.3 — property-based invariants. Generators drive small
  * DataFrames through the real operators (not reimplementations).
  * Deterministic seeds (no scalatest-scalacheck bridge in the offline
  * cache, so forAll is a seeded sample loop). */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def forAll[A](g: Gen[A], trials: Int = 12)(f: A => Unit): Unit =
    (1 to trials).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val values: Gen[List[Double]] =
    Gen.listOfN(12, Gen.chooseNum(-100.0, 100.0))

  test("normalization output is always within [0,1] (epsilon-guarded)") {
    forAll(values) { vs =>
      whenever(vs.nonEmpty) {
        val out = vs.toDF("value").withColumn("band", lit("b"))
          .select(Normalize.minMaxNorm("value", "band").as("n"))
          .collect().map(_.getDouble(0))
        assert(out.forall(v => v >= 0.0 && v <= 1.0))
      }
    }
  }

  test("zero-preserving normalization fixes zeros and stays in [0,1]") {
    forAll(Gen.listOfN(10, Gen.chooseNum(0.0, 50.0))) { vs =>
      whenever(vs.nonEmpty) {
        val out = (0.0 :: vs).toDF("value").withColumn("band", lit("b"))
          .select(col("value"),
            Normalize.zeroPreservingNorm("value", "band").as("n"))
          .collect()
        out.foreach { r =>
          val (v, n) = (r.getDouble(0), r.getDouble(1))
          if (v == 0.0) assert(n == 0.0)
          else assert(n >= 0.0 && n <= 1.0)
        }
      }
    }
  }

  test("severity bucketing is total and monotone in value") {
    val rank = Map("none" -> 0, "low" -> 1, "mid" -> 2, "high" -> 3)
    forAll(values, Gen.chooseNum(0.1, 50.0)) { (vs, std) =>
      whenever(vs.nonEmpty) {
        val out = vs.sorted.toDF("value")
          .select(col("value"), Buckets.severity(col("value"), lit(std)).as("b"))
          .orderBy("value").collect().map(_.getString(1))
        assert(out.forall(rank.contains)) // total
        val ranks = out.map(rank)
        assert(ranks.zip(ranks.drop(1)).forall { case (a, b) => a <= b }) // monotone
      }
    }
  }

  test("grid-snap resample is idempotent at the same resolution") {
    forAll(Gen.listOfN(8, Gen.zip(
      Gen.chooseNum(70.0, 80.0), Gen.chooseNum(20.0, 30.0),
      Gen.chooseNum(0.0, 10.0)))) { pts =>
      whenever(pts.nonEmpty) {
        val df = pts.toDF("lon", "lat", "value").withColumn("band", lit("b"))
        val once = Composites.gridResample(df, res = 0.5)
        // resampling the cell centers again at the same res must not merge
        // or split cells: cell count is a fixpoint
        val again = once
          .withColumn("lon", (col("cell_x") + 0.5) * 0.5)
          .withColumn("lat", (col("cell_y") + 0.5) * 0.5)
          .withColumn("value", col("mean_value"))
        val twice = Composites.gridResample(again, res = 0.5)
        assert(once.count() == twice.count())
      }
    }
  }

  test("unpivot covers the grid bijectively: h*w rows, distinct (y,x)") {
    forAll(Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) { (w, h) =>
      val g = graft.model.GridMeta("d", 0.1, 0, 70.0, 0, -0.1, 30.0,
        "EPSG:4326", w, h, None, 1000)
      val px = Unpivot.gridToPixels(spark, g)
      assert(px.count() == w.toLong * h)
      assert(px.select("y", "x").distinct().count() == w.toLong * h)
    }
  }

  test("filterDate commutes with mean composite") {
    val gen = Gen.listOfN(16, Gen.zip(
      Gen.oneOf("2025-08-01", "2025-08-10", "2025-09-01"),
      Gen.chooseNum(0, 1), Gen.chooseNum(0.0, 9.0)))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("date", "x", "value")
          .withColumn("date", to_date(col("date")))
          .withColumn("band", lit("b")).withColumn("y", lit(0))
        val keys = Seq("band", "y", "x")
        // filter∘mean over the filtered set ≡ mean∘(same filter)
        val a = Composites.meanComposite(
          Filters.dateRange(df, "date", "2025-08-01", "2025-09-01"), keys)
          .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
        val b = Filters.dateRange(df, "date", "2025-08-01", "2025-09-01")
        val b2 = Composites.meanComposite(b, keys)
          .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
        assert(a == b2)
      }
    }
  }

  test("minhash estimated jaccard is 1 for identical docs, bounded in [0,1]") {
    forAll(Gen.listOfN(6, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
      whenever(words.size >= 3) {
        val text = words.mkString(" ")
        val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
        val r = ext.Dedup.minhashNearDups(docs, threshold = 0.0, shingleK = 1)
        val est = r.collect().map(_.getAs[Double]("est_jaccard"))
        assert(est.forall(e => e >= 0.0 && e <= 1.0))
        assert(est.contains(1.0))
      }
    }
  }

  test("polygon dissolve: union area matches grid reference on seeded rects") {
    // seeded axis-aligned rectangles with power-of-2 dims → the
    // piece-fold arithmetic is dyadic-exact, so equality is exact
    val rnd = new scala.util.Random(23)
    val rects = (1 to 12).map { _ =>
      val x0 = rnd.nextInt(12).toDouble
      val y0 = rnd.nextInt(12).toDouble
      val w = (1 << rnd.nextInt(3)).toDouble
      val h = (1 << rnd.nextInt(3)).toDouble
      (x0, y0, x0 + w, y0 + h)
    }
    // independent reference: coordinate compression over slab cells
    def gridUnion(rs: Seq[(Double, Double, Double, Double)]): Double = {
      val xs = rs.flatMap(r => Seq(r._1, r._3)).distinct.sorted
      val ys = rs.flatMap(r => Seq(r._2, r._4)).distinct.sorted
      (for {
        (xa, xb) <- xs.zip(xs.tail)
        (ya, yb) <- ys.zip(ys.tail)
        if rs.exists(r => xa >= r._1 && xb <= r._3 && ya >= r._2 && yb <= r._4)
      } yield (xb - xa) * (yb - ya)).sum
    }
    def polys(rs: Seq[(Double, Double, Double, Double)]) = rs.map {
      case (x0, y0, x1, y1) =>
        IndexedSeq((x0, y0), (x1, y0), (x1, y1), (x0, y1))
    }
    val expected = gridUnion(rects)
    assert(PolyUnion.unionArea(polys(rects)) == expected)
    // order invariance: union is commutative and the arithmetic exact
    assert(PolyUnion.unionArea(polys(rects.reverse)) == expected)
    assert(PolyUnion.unionArea(polys(rnd.shuffle(rects))) == expected)
    // two-polygon case agrees with the inclusion–exclusion path
    val two = polys(rects.take(2))
    assert(math.abs(PolyUnion.unionArea(two) -
      PolygonClip.unionAreaSimple(two(0), two(1))) < 1e-9)
    // the distributed Aggregator returns the same exact value
    val df = rects.map { case (x0, y0, x1, y1) =>
      (Seq(x0, x1, x1, x0), Seq(y0, y0, y1, y1)) }.toDF("xs", "ys")
      .repartition(4) // force partial buffers + merge()
    val got = df.agg(PolyUnion.dissolveArea(col("xs"), col("ys"))).head.getDouble(0)
    assert(got == expected)
  }

  test("interval join equals the brute-force containment join on " +
       "random data, at every bucket width") {
    val rnd = new scala.util.Random(31)
    (1 to 6).foreach { _ =>
      val points = (1L to 40L).map(i => (i, rnd.nextInt(1000).toLong))
      val ivals = (100L to 110L).map { i =>
        val s = rnd.nextInt(900).toLong
        (i, s, s + rnd.nextInt(200).toLong)
      }
      val pdf = points.toDF("pid", "ts_us")
      val idf = ivals.toDF("iid", "start_us", "end_us")
      val want = (for ((p, t) <- points; (i, s, e) <- ivals
                      if t >= s && t <= e) yield (i, p)).toSet
      for (bucket <- Seq(1L, 7L, 100L, 5000L)) {
        val got = IntervalJoin.pointsInIntervals(pdf, "ts_us", idf,
            "start_us", "end_us", bucketMicros = bucket)
          .select("iid", "pid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, s"dupes at bucket=$bucket")
        assert(got.toSet == want, s"bucket=$bucket")
      }
    }
  }

  test("repeatedSpans: spans disjoint per doc, in bounds, and absent " +
       "when every window is unique") {
    val rnd = new scala.util.Random(41)
    (1 to 6).foreach { trial =>
      // half the docs share a planted phrase; half are unique noise
      val phrase = (1 to 6).map(i => s"p$i").mkString(" ")
      val docs = (1L to 8L).map { i =>
        val noise = Seq.fill(10)("n" + rnd.nextInt(100000)).mkString(" ")
        (i, if (i % 2 == 0) s"$noise $phrase" else noise)
      }.toDF("doc_id", "text")
      val spans = graft.ext.Dedup.repeatedSpans(docs, windowK = 4,
          minCount = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // only planted docs can have spans, and a span stays inside the doc
      assert(spans.forall(_._1 % 2 == 0), s"trial $trial: $spans")
      assert(spans.forall { case (_, s, e) => s >= 0 && e >= s && e < 17 })
      // spans of one doc never overlap (maximal-merge invariant)
      spans.groupBy(_._1).values.foreach { ss =>
        val sorted = ss.sortBy(_._2)
        sorted.zip(sorted.drop(1)).foreach { case ((_, _, e1), (_, s2, _)) =>
          assert(e1 < s2, s"trial $trial: overlapping spans $ss")
        }
      }
      // unique-noise-only corpus has no spans at all
      val clean = (1L to 5L).map(i =>
        (i, Seq.fill(12)("u" + rnd.nextInt(1000000)).mkString(" ")))
        .toDF("doc_id", "text")
      assert(graft.ext.Dedup.repeatedSpans(clean, 4, 2).count() == 0)
    }
  }

  test("bloom anti-join equals the plain anti-join on random drop sets") {
    val rnd = new scala.util.Random(53)
    (1 to 4).foreach { _ =>
      val corpus = (0 until 300).map(_ => rnd.nextLong() >> 16).distinct
      val drop = rnd.shuffle(corpus).take(rnd.nextInt(40)) ++
        Seq.fill(10)(rnd.nextLong() >> 16) // non-members too
      val cdf = corpus.toDF("doc_id")
      val ddf = drop.toDF("doc_id")
      val got = graft.ext.Bloom.antiJoinWithBloom(cdf, ddf,
          mBits = 1 << 12, kProbes = 3)
        .collect().map(_.getLong(0)).toSet
      assert(got == (corpus.toSet -- drop.toSet))
    }
  }

  test("bloom anti-join survives full-range 64-bit keys (ANSI wrapping probes)") {
    // unshifted nextLong() + the extremes: probe arithmetic key + i·GOLDEN
    // overflows a signed 64-bit Add for most of this range — build and
    // probe must both WRAP, not throw, and must agree
    val rnd = new scala.util.Random(71)
    val corpus = (Seq(Long.MaxValue, Long.MinValue, Long.MaxValue - 3,
      Long.MinValue + 7, -1L, 0L) ++ (0 until 300).map(_ => rnd.nextLong())).distinct
    val drop = rnd.shuffle(corpus).take(30) ++ Seq.fill(10)(rnd.nextLong())
    val cdf = corpus.toDF("doc_id")
    val ddf = drop.toDF("doc_id")
    val got = graft.ext.Bloom.antiJoinWithBloom(cdf, ddf,
        mBits = 1 << 12, kProbes = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == (corpus.toSet -- drop.toSet))
  }

  test("bloom anti-join keeps null-key rows, matching plain left_anti") {
    val corpus = Seq[(java.lang.Long, String)](
      (1L, "keep"), (2L, "drop"), (null, "null-keep"), (4L, "keep2"),
      (null, "null-keep2")).toDF("doc_id", "text")
    val drop = Seq[java.lang.Long](2L, 99L, null).toDF("doc_id")
    val plain = corpus.join(drop, Seq("doc_id"), "left_anti")
      .collect().map(_.getString(1)).toSet
    val got = graft.ext.Bloom.antiJoinWithBloom(corpus, drop,
        mBits = 1 << 12, kProbes = 3)
      .collect().map(_.getString(1)).toSet
    assert(plain == Set("keep", "keep2", "null-keep", "null-keep2"))
    assert(got == plain)
  }

  test("rolling fingerprint composes: fp(xs :+ t) = rotl5(fp(xs)) ^ fnv(t)") {
    import graft.functions.HashExprs
    val rnd = new scala.util.Random(17)
    def fpLocal(tokens: Seq[String]): Long =
      tokens.foldLeft(0L)((acc, t) =>
        (acc << 5 | acc >>> 59) ^ HashExprs.fnv1a64(t.getBytes("UTF-8")))
    (1 to 50).foreach { _ =>
      val toks = Seq.fill(1 + rnd.nextInt(8))(
        rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString)
      val t = rnd.alphanumeric.take(5).mkString
      val lhs = fpLocal(toks :+ t)
      val rhs = {
        val a = fpLocal(toks)
        (a << 5 | a >>> 59) ^ HashExprs.fnv1a64(t.getBytes("UTF-8"))
      }
      assert(lhs == rhs)
      // and the local fold agrees with the codegen'd expression
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val viaExpr = Seq(Tuple1(toks)).toDF("toks")
        .select(HashExprs.rolling_fnv_fingerprint(col("toks"))).head.getLong(0)
      assert(viaExpr == fpLocal(toks))
    }
  }

  test("chunking with overlap=0 partitions the token stream exactly") {
    val word = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val texts = Gen.listOfN(4, Gen.chooseNum(0, 23).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
    forAll(texts, Gen.chooseNum(1, 7)) { (ts, size) =>
      val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = ext.Curation.chunkDocs(docs, size, overlap = 0)
        .orderBy("doc_id", "chunk_idx").collect()
      // disjoint chunks re-join to the original token stream, and every
      // chunk except the last is exactly `size` tokens
      for ((t, i) <- ts.zipWithIndex) {
        val mine = chunks.filter(_.getLong(0) == i.toLong)
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        assert(mine.flatMap(_.getString(3).split(" ").filter(_.nonEmpty))
          .toSeq == toks, s"doc $i loses tokens")
        mine.dropRight(1).foreach(c => assert(c.getInt(2) == size))
        assert(mine.map(_.getInt(2)).sum == toks.length)
      }
    }
  }

  test("perceptual hash: deterministic through the codec, and invariant " +
       "under a global brightness shift") {
    val pixels = Gen.listOfN(64, Gen.chooseNum(0, 200))
    forAll(Gen.zip(pixels, Gen.chooseNum(1, 55)), trials = 6) { case (ps, shift) =>
      def hashOf(px: Seq[Int]): (Long, Long, Long) = {
        val media = Seq((1L, "image",
          ext.Multimodal.ImageCodec.encodeGrayPng(
            px.map(_.toByte).toArray, 8, 8))).toDF("media_id", "kind", "payload")
        val r = ext.Multimodal.imageHashes(media).head
        (r.getLong(1), r.getLong(2), r.getLong(3))
      }
      val h0 = hashOf(ps)
      assert(h0 == hashOf(ps)) // encode→decode→hash is deterministic
      // +c to every pixel (no clamping): every pairwise comparison and
      // the exact above-mean test are preserved — both hashes identical,
      // the property that makes them PERCEPTUAL (re-exposed copies of an
      // image collide at distance 0)
      assert(hashOf(ps.map(_ + shift)) == h0)
    }
  }

  test("PPS sampling: scaling the expected size only ever grows the set") {
    val weights = Gen.listOfN(12, Gen.chooseNum(1, 500))
    forAll(weights) { ws =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "w")
      def pick(k: Int) = ext.Curation.ppsSample(docs, "w", k)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val s2 = pick(2); val s5 = pick(5); val s20 = pick(20)
      // nested thresholds: floorMod(h, W) < k·w is monotone in k
      assert(s2.subsetOf(s5) && s5.subsetOf(s20))
    }
  }

  test("PQ codes: in-range, partition-invariant, deterministic") {
    val vecGen = Gen.listOfN(12,
      Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f)))
    forAll(vecGen, trials = 6) { vss =>
      val df = vss.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val books = ext.Similarity.pqCodebooks(df, m = 4, k = 4)
      def codes(d: org.apache.spark.sql.DataFrame) =
        ext.Similarity.pqEncode(d, books).collect()
          .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
      val c1 = codes(df)
      assert(c1.values.forall(_.forall(c => c >= 0 && c < 4)),
        "codes must index the codebook")
      // the codes a vector gets cannot depend on how the corpus is
      // partitioned — the property that makes distributed encode correct
      assert(codes(df.repartition(7)) == c1)
      assert(codes(df) == c1)
    }
  }

  test("int8 audit: MSE bounded by scale² (trunc residual < one step)") {
    val vecGen = Gen.listOfN(10,
      Gen.listOfN(6, Gen.chooseNum(-50.0f, 50.0f)))
    forAll(vecGen, trials = 6) { vss =>
      val df = vss.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      ext.Similarity.int8QuantAudit(df).collect().foreach { r =>
        val s = r.getDouble(1); val mse = r.getDouble(3)
        assert(mse >= 0.0 && mse <= s * s + 1e-18,
          s"vec ${r.getLong(0)}: mse $mse vs scale² ${s * s}")
      }
    }
  }

  test("Gopher stopword rule: insertion satisfies it, sw_hits monotone") {
    // note this is deliberately NOT a keep-monotonicity claim: appending
    // short stopwords legitimately shifts mean_word_len and can flip
    // that rule, so only the stopword signal itself is monotone
    val wordGen = Gen.listOfN(60, Gen.identifier.map(_.take(6).toLowerCase))
    forAll(wordGen, trials = 6) { ws =>
      whenever(ws.nonEmpty) {
        val base = ws.mkString(" ")
        val withSw = base + " the of and that"
        val df = Seq((1L, base), (2L, withSw)).toDF("doc_id", "text")
        val r = ext.TextOps.gopherRules(df).collect()
          .map(x => x.getLong(0) -> x).toMap
        assert(r(2L).getAs[Boolean]("r_stopwords"),
          "stopword-augmented doc must pass the stopword rule")
        assert(r(2L).getAs[Int]("sw_hits") >= r(1L).getAs[Int]("sw_hits"))
        // and the word-count signal grows by exactly the four inserted
        assert(r(2L).getAs[Long]("n_words") == r(1L).getAs[Long]("n_words") + 4)
      }
    }
  }
}
