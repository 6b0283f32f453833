package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** SURVEY §2.5 A7/P6 exact case — polygon–polygon clipping.
  *
  * Sutherland–Hodgman (published classic): clip an arbitrary simple
  * subject polygon against a CONVEX clip polygon by successively slicing
  * with each clip edge's half-plane. The reference never clips exactly
  * (`apply_mask=False` everywhere, e.g. DataDownloader_V1.py:50 — bbox is
  * its fidelity bar), so this is an extension: exact per-cell coverage
  * areas for raster–vector overlays, and exact two-polygon union areas via
  * inclusion–exclusion.
  *
  * Scale posture: the clip runs inside a codegen'd projection as a scalar
  * UDF over cell coordinates (branch-heavy vertex loops — the documented
  * UDF exception, like UTM and point-in-polygon); no shuffle, no driver
  * geometry. One convex clip polygon broadcast as literal arguments; cells
  * stream through map-side.
  */
object PolygonClip {

  /** Signed double area (shoelace, CCW positive). */
  def signedArea2(poly: IndexedSeq[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    val n = poly.length
    while (i < n) {
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s
  }

  /** Polygon area (absolute). */
  def area(poly: IndexedSeq[(Double, Double)]): Double =
    math.abs(signedArea2(poly)) / 2.0

  /** Sutherland–Hodgman clip of `subject` against convex `clip` given in
    * CCW order. Output vertices are in subject order; empty when disjoint.
    * Degenerate (zero-area) outputs are possible for edge-touching inputs —
    * callers filtering on area treat them as empty. */
  /** True when `poly` is convex and counter-clockwise: every consecutive
    * edge pair turns left (cross ≥ 0) and the winding is positive. */
  def isConvexCcw(poly: IndexedSeq[(Double, Double)]): Boolean = {
    val n = poly.length
    n >= 3 && signedArea2(poly) > 0 && (0 until n).forall { i =>
      val (ax, ay) = poly(i)
      val (bx, by) = poly((i + 1) % n)
      val (cx, cy) = poly((i + 2) % n)
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) >= 0
    }
  }

  def clip(subject: IndexedSeq[(Double, Double)],
           clipPoly: IndexedSeq[(Double, Double)]): IndexedSeq[(Double, Double)] = {
    // orientation alone is NOT enough: Sutherland–Hodgman against a
    // concave clip polygon silently over-clips, so reject those loudly
    require(isConvexCcw(clipPoly), "clip polygon must be convex CCW")
    var out = subject
    val n = clipPoly.length
    var i = 0
    while (i < n && out.nonEmpty) {
      val (ax, ay) = clipPoly(i)
      val (bx, by) = clipPoly((i + 1) % n)
      // inside = left of (or on) the directed edge a→b
      @inline def inside(px: Double, py: Double): Boolean =
        (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
      @inline def cross(px: Double, py: Double, qx: Double, qy: Double)
          : (Double, Double) = {
        // segment p→q against the infinite edge line a→b
        val t = ((ax - px) * (by - ay) - (ay - py) * (bx - ax)) /
                ((qx - px) * (by - ay) - (qy - py) * (bx - ax))
        (px + t * (qx - px), py + t * (qy - py))
      }
      val in = out
      val next = IndexedSeq.newBuilder[(Double, Double)]
      var j = 0
      while (j < in.length) {
        val (px, py) = in(j)
        val (qx, qy) = in((j + 1) % in.length)
        (inside(px, py), inside(qx, qy)) match {
          case (true, true)   => next += ((qx, qy))
          case (true, false)  => next += cross(px, py, qx, qy)
          case (false, true)  => next += cross(px, py, qx, qy); next += ((qx, qy))
          case (false, false) => ()
        }
        j += 1
      }
      out = next.result()
      i += 1
    }
    out
  }

  /** Exact intersection area of a simple polygon with a convex polygon. */
  def intersectionArea(subject: IndexedSeq[(Double, Double)],
                       clipPoly: IndexedSeq[(Double, Double)]): Double = {
    val c = clip(subject, clipPoly)
    if (c.length < 3) 0.0 else area(c)
  }

  /** A7 exact case for two convex polygons: |A ∪ B| by inclusion–exclusion
    * (exact because A ∩ B of convex inputs is the Sutherland–Hodgman
    * output). */
  def unionArea(a: IndexedSeq[(Double, Double)],
                b: IndexedSeq[(Double, Double)]): Double =
    area(a) + area(b) - intersectionArea(a, b)

  // ------------------------------------------------------- simple polygons

  /** Ear-clipping triangulation of a SIMPLE polygon (no self-intersection,
    * no duplicate vertices); the triangles partition the polygon, so any
    * per-triangle area computation sums exactly. O(n²) — clip polygons are
    * small (boundaries, districts), the data side is where the rows are. */
  def triangulate(poly: IndexedSeq[(Double, Double)])
      : Seq[IndexedSeq[(Double, Double)]] = {
    require(poly.length >= 3, "triangulate: need at least 3 vertices")
    @inline def cross(o: (Double, Double), a: (Double, Double),
                      b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def inTriangle(p: (Double, Double), a: (Double, Double),
                   b: (Double, Double), c: (Double, Double)): Boolean = {
      val (d1, d2, d3) = (cross(a, b, p), cross(b, c, p), cross(c, a, p))
      // INCLUSIVE: a vertex exactly on an ear edge (e.g. a reflex vertex
      // on the diagonal) must block the ear, or the cut slices through it
      d1 >= 0 && d2 >= 0 && d3 >= 0
    }
    val ccw = if (signedArea2(poly) < 0) poly.reverse else poly
    val verts = scala.collection.mutable.ArrayBuffer(ccw: _*)
    val out = Seq.newBuilder[IndexedSeq[(Double, Double)]]
    var guard = 0
    while (verts.length > 3) {
      val n = verts.length
      var i = 0
      var clipped = false
      while (i < n && !clipped) {
        val (p, q, r) = (verts((i + n - 1) % n), verts(i), verts((i + 1) % n))
        val convex = cross(p, q, r) > 0
        if (convex && !verts.indices.exists { j =>
              val v = verts(j)
              v != p && v != q && v != r && inTriangle(v, p, q, r)
            }) {
          out += IndexedSeq(p, q, r)
          verts.remove(i)
          clipped = true
        }
        i += 1
      }
      guard += 1
      require(clipped && guard <= poly.length * 2,
        "triangulate: no ear found — polygon is not simple")
    }
    out += IndexedSeq(verts(0), verts(1), verts(2))
    // collinear-vertex inputs can leave a zero-area final triangle —
    // drop degenerates (they contribute nothing and SH would reject them)
    out.result().filter(t => signedArea2(t) > 0)
  }

  /** Exact intersection area of a simple subject with a simple (possibly
    * CONCAVE) clip polygon: decompose the clip into triangles (each convex)
    * and sum the per-triangle Sutherland–Hodgman areas — the triangles
    * partition the clip polygon, so the sum is the exact intersection. */
  def intersectionAreaSimple(subject: IndexedSeq[(Double, Double)],
                             clipPoly: IndexedSeq[(Double, Double)]): Double =
    triangulate(clipPoly).map(tri => intersectionArea(subject, tri)).sum

  /** Exact union area of two simple polygons by inclusion–exclusion;
    * |A ∩ B| = Σᵢⱼ |triAᵢ ∩ triBⱼ| since each triangulation partitions
    * its polygon. */
  def unionAreaSimple(a: IndexedSeq[(Double, Double)],
                      b: IndexedSeq[(Double, Double)]): Double = {
    val inter = (for {
      ta <- triangulate(a)
      tb <- triangulate(b)
    } yield intersectionArea(ta, tb)).sum
    area(a) + area(b) - inter
  }

  // ------------------------------------------------- rings with holes

  /** One polygon part in OGC ring form: an outer boundary plus interior
    * rings (holes). Validity assumptions (the GAUL/GeoJSON contract):
    * holes lie inside the outer ring and are pairwise disjoint — exactly
    * what makes the subtraction forms below exact. Ring orientation is
    * irrelevant (areas are absolute). */
  final case class PolygonWithHoles(outer: IndexedSeq[(Double, Double)],
                                    holes: Seq[IndexedSeq[(Double, Double)]])

  /** Area of outer − holes (exact by containment + disjointness). */
  def areaWithHoles(p: PolygonWithHoles): Double =
    area(p.outer) - p.holes.map(area).sum

  /** Exact |subject ∩ (outer − holes)| = |subject ∩ outer| −
    * Σ |subject ∩ holeᵢ| — holes are inside the outer ring, so every
    * hole-overlap is also an outer-overlap (inclusion–exclusion needs no
    * higher terms), and disjoint holes never double-subtract. */
  def intersectionAreaWithHoles(subject: IndexedSeq[(Double, Double)],
                                p: PolygonWithHoles): Double =
    intersectionAreaSimple(subject, p.outer) -
      p.holes.map(h => intersectionAreaSimple(subject, h)).sum

  /** Multipolygon area over disjoint parts (the GAUL ADM shape). */
  def multiPolygonArea(parts: Seq[PolygonWithHoles]): Double =
    parts.map(areaWithHoles).sum

  /** Column form for a polygon with holes: triangulate outer and holes
    * ONCE driver-side; each row sums outer-triangle SH areas and
    * subtracts hole-triangle SH areas map-side — same shape as
    * [[cellCoverageSimple]], still zero shuffle. */
  def cellCoverageWithHoles(x0: Column, y0: Column, size: Column,
                            outerX: Seq[Double], outerY: Seq[Double],
                            holes: Seq[(Seq[Double], Seq[Double])]): Column = {
    val outerTris = triangulate(outerX.zip(outerY).toIndexedSeq)
    val holeTris = holes.flatMap { case (hx, hy) =>
      triangulate(hx.zip(hy).toIndexedSeq)
    }
    val f = udf((cx: Double, cy: Double, s: Double) => {
      val cell = IndexedSeq((cx, cy), (cx + s, cy), (cx + s, cy + s), (cx, cy + s))
      outerTris.map(t => intersectionArea(cell, t)).sum -
        holeTris.map(t => intersectionArea(cell, t)).sum
    })
    f(x0, y0, size)
  }

  /** Column form for a simple (possibly concave) polygon: the
    * triangulation runs ONCE driver-side; each row sums per-triangle
    * Sutherland–Hodgman areas map-side. */
  def cellCoverageSimple(x0: Column, y0: Column, size: Column,
                         polyX: Seq[Double], polyY: Seq[Double]): Column = {
    val tris = triangulate(polyX.zip(polyY).toIndexedSeq)
    val f = udf((cx: Double, cy: Double, s: Double) => {
      val cell = IndexedSeq((cx, cy), (cx + s, cy), (cx + s, cy + s), (cx, cy + s))
      tris.map(t => intersectionArea(cell, t)).sum
    })
    f(x0, y0, size)
  }

  /** Column form: exact coverage area of the axis-aligned square cell
    * [x0, x0+size] × [y0, y0+size] inside the convex CCW polygon
    * `(polyX, polyY)`. Scalar math per row — map-side only. */
  def cellCoverage(x0: Column, y0: Column, size: Column,
                   polyX: Seq[Double], polyY: Seq[Double]): Column = {
    val poly = polyX.zip(polyY).toIndexedSeq
    val f = udf((cx: Double, cy: Double, s: Double) =>
      intersectionArea(
        IndexedSeq((cx, cy), (cx + s, cy), (cx + s, cy + s), (cx, cy + s)),
        poly))
    f(x0, y0, size)
  }
}
