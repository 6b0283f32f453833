package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.rng.Seed
import graft.SharedSpark
import PolygonClip._

/** Sutherland–Hodgman invariants (VERDICT r1 stretch: exact polygon ops).
  * Deterministic seeded cases — no flaky generators. */
class ClipSpec extends AnyFunSuite {

  private val unitSq = IndexedSeq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
  private def tri(a: (Double, Double), b: (Double, Double), c: (Double, Double)) =
    IndexedSeq(a, b, c)

  test("clip against a containing box is the identity (area preserved)") {
    val subject = tri((0.2, 0.2), (0.8, 0.3), (0.5, 0.9))
    val big = IndexedSeq((-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0))
    assert(math.abs(intersectionArea(subject, big) - area(subject)) < 1e-12)
  }

  test("disjoint polygons clip to empty") {
    val subject = tri((5.0, 5.0), (6.0, 5.0), (5.5, 6.0))
    assert(clip(subject, unitSq).isEmpty || intersectionArea(subject, unitSq) == 0.0)
  }

  test("clip area never exceeds either input area") {
    val cases = Seq(
      (tri((0.5, -0.5), (1.5, 0.5), (0.5, 1.5)), unitSq),
      (tri((-1.0, 0.5), (2.0, 0.4), (0.5, 0.6)), unitSq),
      (unitSq, tri((0.1, 0.1), (0.9, 0.1), (0.5, 0.8))))
    cases.foreach { case (s, c) =>
      val a = intersectionArea(s, c)
      assert(a <= area(s) + 1e-12 && a <= area(c) + 1e-12)
    }
  }

  test("known overlap: half-shifted unit squares intersect in area 0.25") {
    val shifted = unitSq.map { case (x, y) => (x + 0.5, y + 0.5) }
    assert(intersectionArea(shifted, unitSq) == 0.25)
    assert(intersectionArea(unitSq, shifted) == 0.25)
  }

  test("clipped vertices lie inside (or on) both polygons per the ray-caster") {
    val subject = tri((-0.5, 0.3), (1.4, -0.2), (0.7, 1.6))
    val out = clip(subject, unitSq)
    assert(out.length >= 3)
    val eps = 1e-9
    // grow each polygon test by eps: ray-casting is open on boundaries
    val inSubject = GeoFns.pointInPolygon(subject.map {
      case (x, y) => (x, y) })
    out.foreach { case (x, y) =>
      assert(x >= -eps && x <= 1 + eps && y >= -eps && y <= 1 + eps)
      // interior-nudged point toward subject centroid stays in subject
      val (cx, cy) = (subject.map(_._1).sum / 3, subject.map(_._2).sum / 3)
      val (nx, ny) = (x + (cx - x) * 1e-6, y + (cy - y) * 1e-6)
      assert(inSubject(nx, ny))
    }
  }

  test("seeded random rectangles: SH area equals closed-form overlap") {
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      def next(): Double = {
        val (d, s2) = seed.double; seed = s2; d * 4 - 2
      }
      val (x1, x2) = { val a = next(); val b = next(); (math.min(a, b), math.max(a, b) + 0.1) }
      val (y1, y2) = { val a = next(); val b = next(); (math.min(a, b), math.max(a, b) + 0.1) }
      val rect = IndexedSeq((x1, y1), (x2, y1), (x2, y2), (x1, y2))
      val exact = math.max(0.0, math.min(x2, 1.0) - math.max(x1, 0.0)) *
                  math.max(0.0, math.min(y2, 1.0) - math.max(y1, 0.0))
      assert(math.abs(intersectionArea(rect, unitSq) - exact) < 1e-12)
    }
  }

  test("concave clip polygons are rejected, not silently over-clipped") {
    // CCW L-shape: positive area but a reflex vertex
    val ell = IndexedSeq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0),
                         (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    assert(PolygonClip.signedArea2(ell) > 0) // orientation alone passes
    assert(!PolygonClip.isConvexCcw(ell))
    assertThrows[IllegalArgumentException](clip(unitSq, ell))
    // convex inputs still accepted
    assert(PolygonClip.isConvexCcw(unitSq))
  }

  test("A7 exact union: disjoint boxes sum, nested boxes collapse") {

    val a = unitSq
    val b = unitSq.map { case (x, y) => (x + 5, y) }
    assert(unionArea(a, b) == 2.0)
    val inner = IndexedSeq((0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75))
    assert(unionArea(a, inner) == 1.0)
    assert(unionArea(inner, a) == 1.0)
  }

  test("ear-clipping triangulation partitions simple polygons exactly") {
    val ell = IndexedSeq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0),
                         (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    val tris = triangulate(ell)
    assert(tris.length == 4) // n-2 triangles for a simple hexagon
    assert(math.abs(tris.map(area).sum - area(ell)) < 1e-12)
    assert(math.abs(area(ell) - 3.0) < 1e-12)
    // star-shaped concave pentagon
    val star = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0),
                          (2.0, 1.0), (0.0, 3.0))
    assert(math.abs(triangulate(star).map(area).sum - area(star)) < 1e-12)
  }

  test("concave clip via triangle decomposition: L-shape hand case") {
    val ell = IndexedSeq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0),
                         (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    // unit square at (0.5, 0.5): overlap = full square minus the quarter
    // beyond the L's notch = 1 - 0.25 = 0.75
    val sq = unitSq.map { case (x, y) => (x + 0.5, y + 0.5) }
    assert(math.abs(intersectionAreaSimple(sq, ell) - 0.75) < 1e-12)
    // convex clip: decomposition agrees with direct Sutherland-Hodgman
    val tri0 = tri((0.2, 0.1), (1.8, 0.3), (0.9, 1.9))
    assert(math.abs(intersectionAreaSimple(tri0, unitSq) -
                    intersectionArea(tri0, unitSq)) < 1e-12)
  }

  test("union of simple (concave) polygons by inclusion-exclusion") {
    val ell = IndexedSeq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0),
                         (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    val far = ell.map { case (x, y) => (x + 10, y) }
    assert(math.abs(unionAreaSimple(ell, far) - 6.0) < 1e-12) // disjoint: 3+3
    // overlapping L-shapes: |A|+|B|-|A inter B| with the hand case above
    val sq = unitSq.map { case (x, y) => (x + 0.5, y + 0.5) }
    assert(math.abs(unionAreaSimple(ell, sq) - (3.0 + 1.0 - 0.75)) < 1e-12)
    assert(math.abs(unionAreaSimple(sq, ell) - 3.25) < 1e-12) // symmetric
  }

  test("cellCoverage column over a grid matches scalar computation") {

    val spark = SharedSpark.spark
    import spark.implicits._
    val polyX = Seq(0.25, 2.75, 2.75, 0.25)
    val polyY = Seq(0.25, 0.25, 1.75, 1.75)
    val cells = (0 until 3).flatMap(y => (0 until 3).map(x => (x, y)))
      .toDF("x", "y")
      .withColumn("area", PolygonClip.cellCoverage(
        org.apache.spark.sql.functions.col("x").cast("double"),
        org.apache.spark.sql.functions.col("y").cast("double"),
        org.apache.spark.sql.functions.lit(1.0), polyX, polyY))
    val got = cells.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val poly = polyX.zip(polyY).toIndexedSeq
    (0 until 3).foreach(y => (0 until 3).foreach { x =>
      val expect = intersectionArea(IndexedSeq(
        (x.toDouble, y.toDouble), (x + 1.0, y.toDouble),
        (x + 1.0, y + 1.0), (x.toDouble, y + 1.0)), poly)
      assert(got((x, y)) == expect)
    })
  }

  test("polygon with holes: area and clip follow inclusion-exclusion") {
    // outer 10×10 square, two disjoint holes (2×2 and 3×1)
    val outer = IndexedSeq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val h1 = IndexedSeq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    val h2 = IndexedSeq((5.0, 6.0), (8.0, 6.0), (8.0, 7.0), (5.0, 7.0))
    val p = PolygonWithHoles(outer, Seq(h1, h2))
    assert(areaWithHoles(p) == 100.0 - 4.0 - 3.0)
    // a window overlapping outer and hole 1
    val win = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(intersectionAreaWithHoles(win, p) == 16.0 - 4.0)
    // a window entirely inside hole 1 covers nothing
    val inHole = IndexedSeq((1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5))
    assert(intersectionAreaWithHoles(inHole, p) == 0.0)
    // multipolygon: two disjoint parts sum
    val part2 = PolygonWithHoles(
      IndexedSeq((20.0, 0.0), (24.0, 0.0), (24.0, 4.0), (20.0, 4.0)),
      Seq(IndexedSeq((21.0, 1.0), (22.0, 1.0), (22.0, 2.0), (21.0, 2.0))))
    assert(multiPolygonArea(Seq(p, part2)) == 93.0 + 15.0)
  }

  test("dissolve with holes: filled holes, disjoint parts, order-free") {
    import PolyUnion._
    val outer = IndexedSeq((0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0))
    val hole = IndexedSeq((2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0))
    // part alone: 64 − 16
    assert(unionAreaWithHoles(Seq((outer, Seq(hole)))) == 48.0)
    // a second part that completely fills the hole → full square again
    val filler = IndexedSeq((2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0))
    assert(unionAreaWithHoles(
      Seq((outer, Seq(hole)), (filler, Nil))) == 64.0)
    // order-independence (union is commutative)
    assert(unionAreaWithHoles(
      Seq((filler, Nil), (outer, Seq(hole)))) == 64.0)
    // partial filler: covers half the hole
    val half = IndexedSeq((2.0, 2.0), (4.0, 2.0), (4.0, 6.0), (2.0, 6.0))
    assert(unionAreaWithHoles(
      Seq((outer, Seq(hole)), (half, Nil))) == 48.0 + 8.0)
  }

  test("dissolveAreaWithHoles aggregator matches the local fold") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three parts: square-with-hole, hole filler, offset plain square
    val rows = Seq(
      (Seq(Seq(0.0, 8.0, 8.0, 0.0), Seq(2.0, 6.0, 6.0, 2.0)),
       Seq(Seq(0.0, 0.0, 8.0, 8.0), Seq(2.0, 2.0, 6.0, 6.0))),
      (Seq(Seq(2.0, 6.0, 6.0, 2.0)), Seq(Seq(2.0, 2.0, 6.0, 6.0))),
      (Seq(Seq(10.0, 14.0, 14.0, 10.0)), Seq(Seq(0.0, 0.0, 4.0, 4.0))))
    val got = rows.toDF("xs", "ys")
      .repartition(3)
      .agg(PolyUnion.dissolveAreaWithHoles(col("xs"), col("ys")).as("a"))
      .head.getDouble(0)
    assert(got == 64.0 + 16.0) // full 8×8 (hole filled) + offset 4×4
  }
}
