package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.model.Schemas.BBox

/** Unit tests for §2.2/§2.4/§2.5/§2.8 operators on reference-shaped pixel
  * fixtures (FIXTURES.md §A1 cases: nulls, zeros, constants, bucket
  * boundaries). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** 2 dates × 4 pixels, one band, with nodata nulls
    * (null-skipping mean: EE semantics). */
  private def pixels = Seq(
    // date, band, y, x, lon, lat, value
    ("2025-08-01", "no2", 0, 0, 77.0, 28.5, Some(1.0)),
    ("2025-08-01", "no2", 0, 1, 77.1, 28.5, Some(3.0)),
    ("2025-08-01", "no2", 1, 0, 77.0, 28.6, None),
    ("2025-08-01", "no2", 1, 1, 77.1, 28.6, Some(0.0)),
    ("2025-08-02", "no2", 0, 0, 77.0, 28.5, Some(5.0)),
    ("2025-08-02", "no2", 0, 1, 77.1, 28.5, None),
    ("2025-08-02", "no2", 1, 0, 77.0, 28.6, Some(7.0)),
    ("2025-08-02", "no2", 1, 1, 77.1, 28.6, Some(4.0))
  ).toDF("date", "band", "y", "x", "lon", "lat", "value")
    .withColumn("date", to_date(col("date")))

  test("P4 date range is half-open [start, end)") {
    val r = Filters.dateRange(pixels, "date", "2025-08-01", "2025-08-02")
    assert(r.count() == 4)
    assert(r.select(max("date")).head.getDate(0).toString == "2025-08-01")
  }

  test("P5 bbox keeps only contained points") {
    val r = Filters.filterBounds(pixels, BBox(77.05, 28.55, 77.15, 28.65))
    assert(r.select("y", "x").distinct().collect().toSet == Set(Row(1, 1)))
  }

  test("P6 clip mask nulls outside, keeps extent") {
    val r = Filters.clipMask(pixels, col("lon") < 77.05)
    assert(r.count() == 8) // extent kept
    assert(r.filter(col("value").isNotNull).count() == 3)
  }

  test("A1 mean composite skips nulls like EE mean()") {
    val r = Composites.meanComposite(pixels)
      .orderBy("y", "x").collect()
    // (0,0): (1+5)/2=3; (0,1): only 3.0; (1,0): only 7.0; (1,1): (0+4)/2=2
    assert(r.map(_.getDouble(3)).toSeq == Seq(3.0, 3.0, 7.0, 2.0))
  }

  test("A2 max composite") {
    val r = Composites.maxComposite(pixels)
    assert(r.filter($"y" === 0 && $"x" === 0).head.getDouble(2) == 5.0)
  }

  test("A6 grid resample snaps to coarser cells") {
    val r = Composites.gridResample(pixels, res = 1.0)
    // all lons floor to 77, lats to 28 → single cell per band
    assert(r.count() == 1)
    assert(r.head.getAs[Long]("n_px") == 6) // nulls not counted
  }

  test("A7 bbox union") {
    val r = Composites.bboxUnion(pixels).head
    assert(r.getDouble(0) == 77.0 && r.getDouble(2) == 77.1)
  }

  test("W1 min-max normalization lands in [0,1] with reference epsilon") {
    val r = pixels.select(
      Normalize.minMaxNorm("value", "date", "band").as("norm"))
      .filter(col("norm").isNotNull).collect().map(_.getDouble(0))
    assert(r.forall(v => v >= 0.0 && v <= 1.0))
    // per-raster maxima: 08-01 → (3-0)/(3+1e-6); 08-02 → (7-4)/(3+1e-6)
    assert(r.max === 3.0 / (3.0 + 1e-6))
  }

  test("W2 zero-preserving normalization keeps zeros at 0") {
    val r = pixels.withColumn("norm",
      Normalize.zeroPreservingNorm("value", "date", "band"))
    val zeroRow = r.filter(col("value") === 0.0).head
    assert(zeroRow.getAs[Double]("norm") == 0.0)
    // positives normalized within positive subset
    val pos = r.filter(col("value") > 0).select("norm").collect().map(_.getDouble(0))
    assert(pos.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("W1 constant raster: epsilon guard avoids div-by-zero") {
    val const = Seq(("a", 2.0), ("a", 2.0)).toDF("band", "value")
    val r = const.select(Normalize.minMaxNorm("value", "band").as("n"))
      .collect().map(_.getDouble(0))
    assert(r.forall(v => v == 0.0)) // (2-2)/(0+1e-6) = 0
  }

  test("F1 nanFill: null and NaN both → fill") {
    val df = Seq(Some(Double.NaN), None, Some(2.0)).toDF("v")
    val r = df.select(Normalize.nanFill(col("v")).as("f")).collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(0.0, 0.0, 2.0))
  }

  test("F3 severity buckets are lower-inclusive at s, 1.5s, 2s") {
    val std = 100.0
    val df = Seq(99.999, 100.0, 149.999, 150.0, 199.999, 200.0).toDF("value")
    val r = df.select(Buckets.severity(col("value"), lit(std)).as("b"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("none", "low", "low", "mid", "mid", "high"))
  }

  test("F6 quantize clamps to [0,255]") {
    val df = Seq(-0.5, 0.0, 0.5, 1.0, 1.5).toDF("v")
    val r = df.select(Normalize.quantize255(col("v")).as("q"))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(0, 0, 127, 255, 255))
  }

  test("J3 standards broadcast join buckets per band") {
    import spark.implicits._
    val standards = Seq(("no2", 2.0)).toDF("band", "std_value")
    val r = Buckets.withSeverity(pixels.filter(col("value").isNotNull), standards)
    assert(r.filter($"value" === 7.0).head.getAs[String]("severity") == "high")
    assert(r.filter($"value" === 1.0).head.getAs[String]("severity") == "none")
  }

  test("J9 interval join: containment semantics, bucket-boundary exactness") {
    import spark.implicits._
    // intervals chosen to straddle bucket boundaries (bucket = 100):
    // [50, 250] spans 3 buckets, [400, 400] is a point interval
    val points = Seq((1L, 49L), (2L, 50L), (3L, 150L), (4L, 250L),
      (5L, 251L), (6L, 400L), (7L, 399L)).toDF("pid", "ts_us")
    val ivals = Seq((10L, 50L, 250L), (11L, 400L, 400L))
      .toDF("iid", "start_us", "end_us")
    val r = IntervalJoin.pointsInIntervals(points, "ts_us", ivals,
        "start_us", "end_us", bucketMicros = 100L)
      .select("iid", "pid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    assert(r == Set((10L, 2L), (10L, 3L), (10L, 4L), (11L, 6L)))
    // each qualifying pair appears exactly once (a point has ONE bucket)
    val all = IntervalJoin.pointsInIntervals(points, "ts_us", ivals,
      "start_us", "end_us", bucketMicros = 100L).collect()
    assert(all.length == 4)
  }

  test("gapFillMonths interpolates interior holes, carries edges") {
    import spark.implicits._
    // series a: Jan=10, [Feb,Mar missing], Apr=40 → Feb=20, Mar=30;
    // series b: [Jan missing in grid? no: b starts Feb], Feb=5, Mar
    // missing, May=11 → Mar=7, Apr=9 (two-month linear ramp)
    val df = Seq(
      ("a", "2024-01-15", 10.0), ("a", "2024-04-02", 40.0),
      ("b", "2024-02-01", 5.0), ("b", "2024-05-20", 11.0)
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val r = Windows.gapFillMonths(df, "k", "d", "v")
      .collect().map(x => (x.getString(0), x.getDate(1).toString,
        x.getDouble(2), x.getBoolean(3))).sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      ("a", "2024-01-01", 10.0, true), ("a", "2024-02-01", 20.0, false),
      ("a", "2024-03-01", 30.0, false), ("a", "2024-04-01", 40.0, true),
      ("b", "2024-02-01", 5.0, true), ("b", "2024-03-01", 7.0, false),
      ("b", "2024-04-01", 9.0, false), ("b", "2024-05-01", 11.0, true)))
  }

  test("centeredMovingMean averages the truncated frame at the edges") {
    import spark.implicits._
    val df = Seq(("k", 1, 3.0), ("k", 2, 6.0), ("k", 3, 9.0), ("k", 4, 12.0))
      .toDF("k", "i", "v")
    val r = Windows.centeredMovingMean(df, "k", "i", "v")
      .orderBy("i").collect().map(_.getAs[Double]("smoothed"))
    assert(r.toSeq == Seq(4.5, 6.0, 9.0, 10.5)) // edges avg 2, interior 3
  }

  test("gapFillMonths: leading/trailing holes carry the nearest edge") {
    import spark.implicits._
    // one observed month in the middle of a punched series → the grid is
    // only [lo,hi] of OBSERVED months, so no extrapolation can occur; a
    // doubly-bracketed single hole still interpolates
    val df = Seq(("k", "2024-03-01", 6.0), ("k", "2024-05-01", 6.0))
      .toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val r = Windows.gapFillMonths(df, "k", "d", "v")
      .collect().map(x => (x.getDate(1).toString, x.getDouble(2)))
      .sortBy(_._1)
    assert(r.toSeq == Seq(("2024-03-01", 6.0), ("2024-04-01", 6.0),
      ("2024-05-01", 6.0)))
  }
}
