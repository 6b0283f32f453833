package graft.ops

import org.apache.spark.sql.expressions.Aggregator

/** A7 full dissolve — exact N-polygon union as a typed Aggregator (the
  * true `punjab.geometry()` semantics: DataDownloader_SNPP_VIIRS_V1.py:36
  * dissolves every district geometry into one region before filtering).
  *
  * Representation: the running union is a set of DISJOINT CONVEX pieces.
  * Adding a polygon = triangulate it (PolygonClip.triangulate), then for
  * each triangle subtract every existing piece and keep what remains. The
  * subtraction uses the classic convex-difference decomposition: for a
  * convex clip C with CCW edges e1..ek,
  *
  *   T \ C  =  ⋃ᵢ  T ∩ outside(eᵢ) ∩ inside(e₁) ∩ … ∩ inside(eᵢ₋₁)
  *
  * — disjoint by construction, each piece convex (an intersection of
  * half-planes with a convex set), each computed by single-edge
  * Sutherland–Hodgman passes. Union area = Σ piece areas, exact.
  *
  * Scale posture: polygons are the SMALL side (districts, boundaries —
  * tens to thousands), so an O(pieces²) driver-free fold inside a typed
  * Aggregator is the right shape: partial unions build map-side per
  * partition, merge() dissolves partial piece-sets pairwise, and only
  * piece lists (not input rows) cross the shuffle.
  */
object PolyUnion {

  type Poly = IndexedSeq[(Double, Double)]

  /** Clip a convex CCW polygon against one directed edge's half-plane.
    * keepLeft=true keeps the inside (left) side — same inside test and
    * intersection arithmetic as PolygonClip.clip, one edge at a time. */
  def clipHalfPlane(poly: Poly, ax: Double, ay: Double,
                    bx: Double, by: Double, keepLeft: Boolean): Poly = {
    if (poly.isEmpty) return poly
    @inline def side(px: Double, py: Double): Double =
      (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    @inline def in(px: Double, py: Double): Boolean =
      if (keepLeft) side(px, py) >= 0 else side(px, py) <= 0
    @inline def cross(px: Double, py: Double, qx: Double, qy: Double)
        : (Double, Double) = {
      val t = ((ax - px) * (by - ay) - (ay - py) * (bx - ax)) /
              ((qx - px) * (by - ay) - (qy - py) * (bx - ax))
      (px + t * (qx - px), py + t * (qy - py))
    }
    val next = IndexedSeq.newBuilder[(Double, Double)]
    var j = 0
    while (j < poly.length) {
      val (px, py) = poly(j)
      val (qx, qy) = poly((j + 1) % poly.length)
      (in(px, py), in(qx, qy)) match {
        case (true, true)   => next += ((qx, qy))
        case (true, false)  => next += cross(px, py, qx, qy)
        case (false, true)  => next += cross(px, py, qx, qy); next += ((qx, qy))
        case (false, false) => ()
      }
      j += 1
    }
    // drop consecutive duplicates (a vertex exactly on the line enters
    // twice via the two cross cases) — downstream edge loops must never
    // see zero-length edges
    val raw = next.result()
    if (raw.isEmpty) raw
    else raw.indices.collect {
      case i if raw(i) != raw((i + 1) % raw.length) => raw(i)
    }
  }

  /** part ∩ c by folding half-plane clips over c's edges — equivalent to
    * Sutherland–Hodgman for convex c, but with NO convexity `require`:
    * stored pieces can carry ~1-ulp concave turns from inexact
    * intersection arithmetic on non-dyadic inputs, and a strict check
    * would abort the whole job over measure-zero noise. */
  private def intersectHalfPlanes(part: Poly, c: Poly): Poly = {
    var rem = part
    var i = 0
    val n = c.length
    while (i < n && rem.length >= 3) {
      val (ax, ay) = c(i)
      val (bx, by) = c((i + 1) % n)
      if (ax != bx || ay != by)
        rem = clipHalfPlane(rem, ax, ay, bx, by, keepLeft = true)
      i += 1
    }
    if (rem.length < 3) IndexedSeq.empty else rem
  }

  /** `part \ c` as disjoint convex pieces (c convex CCW). */
  def convexDifference(part: Poly, c: Poly): List[Poly] = {
    // no-overlap fast path — ESSENTIAL, not just fast: the edge-by-edge
    // decomposition below slices by INFINITE edge lines, so without this
    // check a part far away from c still fragments into |c| slivers, and
    // fragment counts compound exponentially across subtractions
    val inter = intersectHalfPlanes(part, c)
    if (inter.length < 3 || PolygonClip.area(inter) == 0) return List(part)
    val out = List.newBuilder[Poly]
    var rem = part
    var i = 0
    val n = c.length
    while (i < n && rem.length >= 3) {
      val (ax, ay) = c(i)
      val (bx, by) = c((i + 1) % n)
      // a zero-length edge has no outside half-plane; treating it like a
      // real edge would copy ALL of rem into the output (double-count)
      if (ax != bx || ay != by) {
        val outside = clipHalfPlane(rem, ax, ay, bx, by, keepLeft = false)
        if (outside.length >= 3 && PolygonClip.area(outside) > 0) out += outside
        rem = clipHalfPlane(rem, ax, ay, bx, by, keepLeft = true)
      }
      i += 1
    }
    out.result() // rem (= part ∩ c) is already covered — dropped
  }

  /** Fold one convex piece into the disjoint-piece union: subtract every
    * existing piece, keep the remainder. */
  private def addConvexPiece(pieces: List[Poly], t: Poly): List[Poly] = {
    var parts: List[Poly] = List(t)
    var it = pieces
    while (it.nonEmpty && parts.nonEmpty) {
      val c = it.head
      parts = parts.flatMap(part => convexDifference(part, c))
      it = it.tail
    }
    pieces ::: parts.filter(PolygonClip.area(_) > 0)
  }

  /** Fold one simple polygon into the disjoint-piece union. */
  def addPolygon(pieces: List[Poly], p: Poly): List[Poly] =
    PolygonClip.triangulate(p).foldLeft(pieces)(addConvexPiece)

  /** Disjoint convex decomposition of (outer − holes): triangulate the
    * outer ring, then carve each hole triangle out of every piece with the
    * same convex-difference machinery the union fold uses. Exact under the
    * OGC validity contract (holes inside outer, pairwise disjoint); holes
    * may be concave. */
  def polygonWithHolesPieces(outer: Poly, holes: Seq[Poly]): List[Poly] = {
    var pieces: List[Poly] = PolygonClip.triangulate(outer).toList
    holes.foreach { h =>
      PolygonClip.triangulate(h).foreach { ht =>
        pieces = pieces.flatMap(p => convexDifference(p, ht))
      }
    }
    pieces.filter(PolygonClip.area(_) > 0)
  }

  /** Fold a polygon WITH HOLES into the disjoint-piece union — the GAUL
    * multipolygon dissolve case. The part's region is decomposed first,
    * so overlap with other parts is handled identically to the simple
    * fold (a hole of one part covered by another part stays covered). */
  def addPolygonWithHoles(pieces: List[Poly], outer: Poly,
                          holes: Seq[Poly]): List[Poly] =
    polygonWithHolesPieces(outer, holes).foldLeft(pieces)(addConvexPiece)

  /** Exact union area of polygons with holes (local form). */
  def unionAreaWithHoles(parts: Seq[(Poly, Seq[Poly])]): Double =
    parts.foldLeft(List.empty[Poly]) { case (acc, (o, hs)) =>
      addPolygonWithHoles(acc, o, hs)
    }.map(PolygonClip.area).sum

  /** Exact union area of simple polygons (local form, shared by tests). */
  def unionArea(polys: Seq[Poly]): Double =
    polys.foldLeft(List.empty[Poly])(addPolygon)
      .map(PolygonClip.area).sum

  /** One input polygon as parallel vertex arrays. */
  final case class PolyRow(xs: Seq[Double], ys: Seq[Double])

  /** Typed Aggregator: rows of (xs, ys) vertex arrays → exact union area.
    * merge() dissolves one buffer's pieces into the other, so partial
    * aggregation works map-side and input order is irrelevant (union is
    * commutative; the arithmetic is exact for dyadic-rational inputs).
    *
    * The buffer is the piece list itself: ScalaAggregator keeps it as a
    * JVM object between updates, so no per-row decode/encode; the kryo
    * encoder only runs at partial-output / spill boundaries. */
  class DissolveAggregator extends Aggregator[PolyRow, List[Poly], Double] {

    override def zero: List[Poly] = Nil

    override def reduce(b: List[Poly], in: PolyRow): List[Poly] =
      PolyUnion.addPolygon(b, in.xs.zip(in.ys).toIndexedSeq)

    override def merge(b1: List[Poly], b2: List[Poly]): List[Poly] =
      b2.foldLeft(b1)(PolyUnion.addPolygon)

    override def finish(b: List[Poly]): Double =
      b.map(PolygonClip.area).sum

    override def bufferEncoder: org.apache.spark.sql.Encoder[List[Poly]] =
      org.apache.spark.sql.Encoders.kryo[List[Poly]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Column form, usable in an agg(): `dissolveArea(xs, ys)`. */
  def dissolveArea(xs: org.apache.spark.sql.Column,
                   ys: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new DissolveAggregator,
      org.apache.spark.sql.Encoders.product[PolyRow]).apply(xs, ys)

  /** One multipolygon part as ring lists: ring 0 is the outer boundary,
    * the rest are holes — the GeoJSON/GAUL coordinate layout. */
  final case class MultiPolyRow(xs: Seq[Seq[Double]], ys: Seq[Seq[Double]])

  /** Typed Aggregator over parts WITH HOLES — same disjoint-piece buffer
    * and merge as [[DissolveAggregator]], so partial aggregation and
    * order-independence carry over unchanged. */
  class DissolveHolesAggregator
      extends Aggregator[MultiPolyRow, List[Poly], Double] {

    override def zero: List[Poly] = Nil

    override def reduce(b: List[Poly], in: MultiPolyRow): List[Poly] = {
      require(in.xs.nonEmpty && in.xs.length == in.ys.length,
        "MultiPolyRow needs ring 0 (outer) with matching xs/ys")
      val rings = in.xs.zip(in.ys).map { case (x, y) =>
        x.zip(y).toIndexedSeq
      }
      PolyUnion.addPolygonWithHoles(b, rings.head, rings.tail)
    }

    override def merge(b1: List[Poly], b2: List[Poly]): List[Poly] =
      b2.foldLeft(b1)(PolyUnion.addPolygon)

    override def finish(b: List[Poly]): Double =
      b.map(PolygonClip.area).sum

    override def bufferEncoder: org.apache.spark.sql.Encoder[List[Poly]] =
      org.apache.spark.sql.Encoders.kryo[List[Poly]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Column form: `dissolveAreaWithHoles(ringXs, ringYs)` where the
    * arguments are array<array<double>> ring lists. */
  def dissolveAreaWithHoles(xs: org.apache.spark.sql.Column,
                            ys: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new DissolveHolesAggregator,
      org.apache.spark.sql.Encoders.product[MultiPolyRow]).apply(xs, ys)
}
