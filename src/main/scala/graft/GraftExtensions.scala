package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashSignature, SimHash64}

/** SQL surface for the engine's custom expressions.
  *
  * Either install at session build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or register into a live session with `GraftExtensions.registerAll(spark)`.
  * Afterwards plain SQL can use them:
  * {{{
  *   SELECT simhash64(transform(tokens, t -> xxhash64(t))) FROM docs
  *   SELECT minhash_signature(hashes, 16) FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def simhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash64(hashes: array<bigint>)")
    SimHash64(exprs.head)
  }

  private def minhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "minhash_signature(hashes: array<bigint>, k: int literal)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_signature: k must be an integer literal, got $other")
    }
    MinHashSignature(exprs.head, k)
  }

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simhashBuilder _),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      minhashBuilder _))

  /** Register into an existing session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
