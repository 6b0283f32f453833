package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class HullSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("monotone chain hull: square with interior points") {
    val pts = Seq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4),
                  Pt(2, 2), Pt(1, 3), Pt(3, 1))
    val h = HullAggregator.hull(pts).toSet
    assert(h == Set(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)))
  }

  test("degenerate inputs: single point, collinear set") {
    assert(HullAggregator.hull(Seq(Pt(1, 1))) == Seq(Pt(1, 1)))
    val col = HullAggregator.hull(Seq(Pt(0, 0), Pt(1, 1), Pt(2, 2), Pt(3, 3)))
    assert(col.toSet.subsetOf(Set(Pt(0, 0), Pt(3, 3))))
  }

  test("A7: typed aggregation dissolves a point layer distributively") {
    val pts = Seq(
      Pt(77.0, 28.0), Pt(78.0, 28.0), Pt(78.0, 29.0), Pt(77.0, 29.0),
      Pt(77.5, 28.5), Pt(77.2, 28.8)).toDS().repartition(3)
    val out = pts.select(HullAggregator.toColumn.name("hull")).head()
    assert(out.points.toSet ==
      Set(Pt(77.0, 28.0), Pt(78.0, 28.0), Pt(78.0, 29.0), Pt(77.0, 29.0)))
  }

  test("hull of partition-partial hulls equals hull of all points") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(200)(Pt(rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val whole = HullAggregator.hull(pts).toSet
    val (a, b) = pts.splitAt(100)
    val merged = HullAggregator.hull(
      (HullAggregator.hull(a) ++ HullAggregator.hull(b))).toSet
    assert(whole == merged)
  }

  test("buffer stays bounded by hull size plus slack on a circle stream") {
    // every point is a hull vertex -> worst case for the compressor
    val pts = (0 until 300).map { i =>
      val a = 2 * math.Pi * i / 300
      Pt(math.cos(a), math.sin(a))
    }
    var buf = HullAggregator.zero
    pts.foreach { p =>
      buf = HullAggregator.reduce(buf, p)
      assert(buf.points.length <= buf.floor)
      assert(buf.floor <= 300 + 64)
    }
    val out = HullAggregator.finish(buf)
    // all inputs are extreme points, so the hull keeps every one
    assert(out.points.length == 300)
  }
}
