package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** DotFold must be a drop-in for the declarative
  * aggregate(zip_with(a, b, x*y), 0.0, acc+x) chain it replaced — same
  * values BIT FOR BIT (the similarity oracles replay the fold in DuckDB),
  * same null semantics, and identical between interpreted eval and
  * codegen. */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def oldChain(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  test("dot_fold is bit-identical to the declarative fold on float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 4 - 2),
       Array.fill(64)(rnd.nextFloat() * 4 - 2)))
    val df = rows.toDF("a", "b")
      .select(VectorExprs.dot_fold(col("a"), col("b")).as("nf"),
              oldChain(col("a"), col("b")).as("old"))
    // exact equality of the doubles, not approximate: the fold order is
    // the contract
    assert(df.filter(col("nf") =!= col("old") ||
      col("nf").isNull =!= col("old").isNull).count() == 0)
  }

  test("dot_fold null semantics match zip_with padding") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),  // 11.0
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),        // length mismatch → null
      (None, Some(Seq(1.0f)))                          // null input → null
    ).toDF("a", "b")
      .select(VectorExprs.dot_fold(col("a"), col("b")).as("d"),
              oldChain(col("a"), col("b")).as("old"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getDouble(0),
       if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got(0) == ((11.0, 11.0)))
    assert(got(1) == ((null, null)))
    assert(got(2) == ((null, null)))
    // null ELEMENT poisons the sum in both formulations
    val el = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS ARRAY<DOUBLE>) AS a," +
      "       CAST(array(2.0, 3.0) AS ARRAY<DOUBLE>) AS b")
      .select(VectorExprs.dot_fold(col("a"), col("b")).as("d"),
              oldChain(col("a"), col("b")).as("old")).head
    assert(el.isNullAt(0) && el.isNullAt(1))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path via a fresh expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = Literal(new GenericArrayData(Array(1.5f, -2.25f, 3.0f)),
      ArrayType(FloatType, containsNull = false))
    val b = Literal(new GenericArrayData(Array(0.5, 2.0, -1.0)),
      ArrayType(DoubleType, containsNull = false))
    val expect = 1.5f.toDouble * 0.5 + (-2.25f).toDouble * 2.0 +
      3.0f.toDouble * -1.0
    assert(DotFold(a, b).eval(null) == expect)
    // codegen path through a real plan
    val viaPlan = Seq((Seq(1.5f, -2.25f, 3.0f), Seq(0.5, 2.0, -1.0)))
      .toDF("a", "b")
      .select(VectorExprs.dot_fold(col("a"), col("b"))).head.getDouble(0)
    assert(viaPlan == expect)
  }
}
