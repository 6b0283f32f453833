package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Point with lon/lat — named fields give the aggregator a columnar
  * struct schema (kryo blobs would hide it from the optimizer). */
case class Pt(lon: Double, lat: Double)
/** `floor` = re-compress trigger: hull size at the last compression plus
  * 64 points of slack, so a hull with many vertices pays one O(h log h)
  * pass per 64 inserts instead of per insert. */
case class HullBuf(points: List[Pt], floor: Int)
case class HullOut(points: Seq[Pt])

/** SURVEY §2.4 A7 / §2.10 — geometry dissolve beyond the bbox union: a
  * custom typed `Aggregator` computing the convex hull of a point set
  * (Andrew's monotone chain). The reference dissolves a FeatureCollection
  * into one geometry (`punjab.geometry()`); bbox union ships as the fast
  * path (`Composites.bboxUnion`), this is the exact-geometry step for
  * point layers — which is all the reference's amenity layers are. Exact
  * polygon-polygon union stays future work (needs robust clipping).
  *
  * Scale shape: the buffer compresses to the hull of the points seen so
  * far, so partial aggregation bounds buffer size by hull complexity, not
  * partition row count — merge-friendly like any algebraic aggregate.
  */
object HullAggregator extends Aggregator[Pt, HullBuf, HullOut] {

  private val Slack = 64

  override def zero: HullBuf = HullBuf(Nil, Slack)

  override def reduce(buf: HullBuf, p: Pt): HullBuf =
    compress(p :: buf.points, buf.floor)

  override def merge(a: HullBuf, b: HullBuf): HullBuf =
    compress(a.points ::: b.points, math.max(a.floor, b.floor))

  override def finish(buf: HullBuf): HullOut = HullOut(hull(buf.points))

  // Compress to the hull once `Slack` points accumulate beyond the last
  // hull size: bounds the buffer by hull complexity + slack while paying
  // one O(h log h) pass per `Slack` inserts — the round-1 fixed threshold
  // re-hulled on EVERY row once the hull outgrew it.
  private def compress(pts: List[Pt], floor: Int): HullBuf =
    if (pts.length <= floor) HullBuf(pts, floor)
    else {
      val h = hull(pts).toList
      HullBuf(h, h.length + Slack)
    }

  /** Andrew's monotone chain; counter-clockwise, first point not
    * repeated. Degenerate inputs (≤2 distinct points, collinear sets)
    * return the extremes. */
  def hull(points: Seq[Pt]): Seq[Pt] = {
    val pts = points.map(p => (p.lon, p.lat)).distinct.sorted
    if (pts.length <= 2) return pts.map(t => Pt(t._1, t._2))
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): List[(Double, Double)] = {
      var st = List.empty[(Double, Double)]
      ps.foreach { p =>
        while (st.length >= 2 && cross(st.tail.head, st.head, p) <= 0)
          st = st.tail
        st = p :: st
      }
      st.reverse.dropRight(1)
    }
    (half(pts) ::: half(pts.reverse)).map(t => Pt(t._1, t._2))
  }

  override def bufferEncoder: Encoder[HullBuf] = Encoders.product[HullBuf]
  override def outputEncoder: Encoder[HullOut] = Encoders.product[HullOut]
}
