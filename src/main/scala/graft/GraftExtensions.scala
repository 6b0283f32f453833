package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BpeExplode, BpeSubwords, Mix64, MinHashSignature, RollingFnvFingerprint, ShingleHashes, ShingleHashesAll, SimHash64, StringShingles}

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

  private def shingleBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "shingle_hashes(text: string, k: int literal)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"shingle_hashes: k must be an integer literal, got $other")
    }
    ShingleHashes(exprs.head, k)
  }

  private def shingleAllBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "shingle_hashes_all(text: string, k: int literal)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"shingle_hashes_all: k must be an integer literal, got $other")
    }
    ShingleHashesAll(exprs.head, k)
  }

  private def stringShingleBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "string_shingles(text: string, k: int literal)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"string_shingles: k must be an integer literal, got $other")
    }
    StringShingles(exprs.head, k)
  }

  private def fingerprintBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      "rolling_fnv_fingerprint(tokens: array<string>)")
    RollingFnvFingerprint(exprs.head)
  }

  private def mix64Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "mix64(h: bigint)")
    Mix64(exprs.head)
  }

  private def bpeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "bpe_subwords(text: string)")
    // SQL binds the in-repo fixture table (SQL cannot pass a merge
    // table); the programmatic API takes any table, incl. x105-trained
    BpeSubwords(exprs.head, graft.ext.TextOps.bpeFixtureMerges)
  }

  private def bpeExplodeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "bpe_explode(text: string)")
    BpeExplode(exprs.head, graft.ext.TextOps.bpeFixtureMerges)
  }

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simhashBuilder _),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      minhashBuilder _),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      shingleBuilder _),
    ("shingle_hashes_all",
      new ExpressionInfo(classOf[ShingleHashesAll].getName,
        "shingle_hashes_all"),
      shingleAllBuilder _),
    ("string_shingles",
      new ExpressionInfo(classOf[StringShingles].getName, "string_shingles"),
      stringShingleBuilder _),
    ("rolling_fnv_fingerprint",
      new ExpressionInfo(classOf[RollingFnvFingerprint].getName,
        "rolling_fnv_fingerprint"),
      fingerprintBuilder _),
    ("mix64",
      new ExpressionInfo(classOf[Mix64].getName, "mix64"),
      mix64Builder _),
    ("bpe_subwords",
      new ExpressionInfo(classOf[BpeSubwords].getName, "bpe_subwords"),
      bpeBuilder _),
    ("bpe_explode",
      new ExpressionInfo(classOf[BpeExplode].getName, "bpe_explode"),
      bpeExplodeBuilder _))

  /** Register into an existing session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
