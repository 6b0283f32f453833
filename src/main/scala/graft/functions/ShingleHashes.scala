package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize → k-gram shingle → 64-bit hash → distinct, in one pass over
  * the text. Replaces the declarative split/transform/slice/array_distinct
  * /xxhash64 chain, whose per-lambda interpreted dispatch dominated the
  * dedup queries (~2 ms/doc). Hash family: FNV-1a per token, polynomial
  * combine + splitmix64 finalize per shingle — values are engine-internal
  * (only distinctness and determinism matter; the Jaccard/minhash/simhash
  * results are hash-value-independent). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(ShingleHashes.shingleHashes(s, k))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** Positional sibling of [[ShingleHashes]]: same tokenizer and hash
  * family, but emitting EVERY k-gram window hash in document order with
  * duplicates kept — element i is the hash of the window starting at token
  * i. `posexplode` over the result yields (token position, window hash)
  * pairs, the input shape for repeated-substring span detection
  * (suffix-array-style dedup), where both the position and the repeat
  * multiplicity matter and a distinct set would destroy them. */
case class ShingleHashesAll(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(ShingleHashes.shingleHashesAll(s, k))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes_all"
}

object ShingleHashesAll {
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(ShingleHashesAll(GraftBridge.expression(text), k))
}

/** String sibling of [[ShingleHashes]]: tokenize → k-gram shingle →
  * distinct, but emitting the space-joined lowercased gram STRINGS rather
  * than hashes — for operators whose output is the gram itself (boilerplate
  * n-gram reports, x30) where a hash would be unreadable. Same
  * tokenization (whitespace split, per-char lowercase, empties dropped) so
  * gram populations line up with the hashed tier. */
case class StringShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val grams = StringShingles.stringShingles(s, k)
    new GenericArrayData(grams.map(UTF8String.fromString(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "string_shingles"
}

/** Tokenizer twin of [[ShingleHashesAll]], emitting the TOKENS instead of
  * window hashes: per-char lowercased, split on `Character.isWhitespace`,
  * empties dropped — element i here is the token at window position i
  * reported by repeated-span detection, so span token indexes align by
  * construction. A regex `\\s+` split is NOT equivalent (ASCII-only), and
  * `(?U)\\s` over-matches (it adds U+00A0/U+2007/U+202F no-break spaces,
  * which `Character.isWhitespace` excludes) — on documents with Unicode
  * whitespace either regex shifts the indexes and the wrong tokens get
  * removed. */
case class TokenSplit(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      TokenSplit.tokenize(s).map(UTF8String.fromString(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "token_split"
}

object TokenSplit {

  def apply(text: Column): Column =
    GraftBridge.column(TokenSplit(GraftBridge.expression(text)))

  /** THE token boundary definition shared by every shingle/span operator:
    * per-char `Character.toLowerCase`, split on `Character.isWhitespace`,
    * empty tokens dropped. */
  def tokenize(text: String): Array[String] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = text.length
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      } else sb.append(Character.toLowerCase(c))
      i += 1
    }
    toks.toArray
  }
}

object StringShingles {

  def apply(text: Column, k: Int): Column =
    GraftBridge.column(StringShingles(GraftBridge.expression(text), k))

  /** Distinct k-gram token shingles of `text` (lowercased,
    * whitespace-tokenized, space-joined), first-occurrence order. */
  def stringShingles(text: String, k: Int): Array[String] = {
    val toks = TokenSplit.tokenize(text)
    val sb = new java.lang.StringBuilder
    val m = toks.length
    if (m < k) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var s = 0
    while (s <= m - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(s + j))
        j += 1
      }
      seen.add(sb.toString)
      s += 1
    }
    seen.toArray(Array.empty[String])
  }
}

object ShingleHashes {

  def apply(text: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), k))

  private final val FNV_OFFSET = 0xCBF29CE484222325L
  private final val FNV_PRIME = 0x100000001B3L
  private final val COMBINE = 1000003L

  /** Distinct hashes of all k-gram token shingles of `text` (lowercased,
    * whitespace-tokenized), first-occurrence order. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    // single-pass tokenizer: FNV-1a over lowercased bytes of each token
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = FNV_OFFSET
    var inTok = false
    var i = 0
    val n = text.length
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (Character.isWhitespace(c)) {
        if (inTok) { tokHashes += h; h = FNV_OFFSET; inTok = false }
      } else {
        inTok = true
        val lc = Character.toLowerCase(c)
        // FNV over the UTF-16 code unit's bytes
        h = (h ^ (lc & 0xFF)) * FNV_PRIME
        h = (h ^ ((lc >> 8) & 0xFF)) * FNV_PRIME
      }
      i += 1
    }
    val m = tokHashes.length
    if (m < k) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](m)
    var s = 0
    while (s <= m - k) {
      var sh = 0L
      var j = 0
      while (j < k) { sh = sh * COMBINE + tokHashes(s + j); j += 1 }
      val fin = HashExprs.mix64(sh)
      if (seen.add(fin)) out += fin
      s += 1
    }
    out.toArray
  }

  /** ALL k-gram window hashes of `text` in document order, duplicates
    * kept — same tokenizer and hash family as [[shingleHashes]]; element i
    * is the window starting at token i (length max(0, nTokens-k+1)). */
  def shingleHashesAll(text: String, k: Int): Array[Long] = {
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = FNV_OFFSET
    var inTok = false
    var i = 0
    val n = text.length
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (Character.isWhitespace(c)) {
        if (inTok) { tokHashes += h; h = FNV_OFFSET; inTok = false }
      } else {
        inTok = true
        val lc = Character.toLowerCase(c)
        h = (h ^ (lc & 0xFF)) * FNV_PRIME
        h = (h ^ ((lc >> 8) & 0xFF)) * FNV_PRIME
      }
      i += 1
    }
    val m = tokHashes.length
    if (m < k) return Array.emptyLongArray
    val out = new Array[Long](m - k + 1)
    var s = 0
    while (s <= m - k) {
      var sh = 0L
      var j = 0
      while (j < k) { sh = sh * COMBINE + tokHashes(s + j); j += 1 }
      out(s) = HashExprs.mix64(sh)
      s += 1
    }
    out
  }
}
