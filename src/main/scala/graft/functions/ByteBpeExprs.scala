package graft.functions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style regex pre-tokenization (Radford et al. 2019; the split
  * step of every byte-level BPE tokenizer: GPT-2, RoBERTa, and the
  * tiktoken family descend from this exact pattern):
  *
  * {{{ 's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+ }}}
  *
  * Semantics that matter (and that [[graft.ext.ByteBpeSpec]] pins):
  *  - a single leading SPACE (0x20 only — not tabs/newlines) fuses into
  *    the following letter/number/symbol run (`" the"` is ONE
  *    pre-token — the signature property of GPT-2 vocabularies);
  *  - a whitespace run followed by text yields the run MINUS its last
  *    character (the `\s+(?!\S)` lookahead), the last space donating
  *    itself to the next pre-token;
  *  - the seven lowercase English contractions split off (`it's` →
  *    `it` + `'s`), but only when the scanner lands exactly on the
  *    apostrophe — `!!'s` keeps `!!'` whole (greedy symbol run);
  *  - character classes are pinned: `\s` is Java's ASCII default
  *    `[ \t\n\x0B\f\r]`, `\p{L}`/`\p{N}` are the Unicode letter/number
  *    categories — the DuckDB oracle replays the same classes in RE2.
  *
  * No lowercasing and no whitespace dropping: byte-level BPE is
  * lossless, every input byte lands in exactly one pre-token. */
object Gpt2Split {

  val PatternText: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val pat = Pattern.compile(PatternText)

  /** Split text into GPT-2 pre-tokens. The pattern tiles the input:
    * concatenating the result reproduces the text byte for byte. */
  def pretokenize(text: String): Array[String] = {
    if (text.isEmpty) return Array.empty
    val m = pat.matcher(text)
    val out = new scala.collection.mutable.ArrayBuffer[String](
      text.length / 4 + 4)
    while (m.find()) out += m.group()
    out.toArray
  }
}

/** Byte-level BPE over GPT-2 pre-tokens. The alphabet is the 256 UTF-8
  * BYTES (represented internally as Latin-1 characters, one char per
  * byte, so [[BpeKernel]]'s merge loop applies unchanged); merge rules
  * are pairs of byte sequences. There is no OOV: a byte no rule covers
  * simply stays a single-byte token — the "byte fallback" that lets
  * byte-level vocabularies encode any input, which is exactly where
  * byte-level and word-level token counts diverge (CJK: 3 tokens per
  * uncovered character; emoji: 4).
  *
  * Reference semantics per GEE_DataPipeline's corpus-profiling tier
  * (token accounting feeds budget decisions); algorithm per Sennrich
  * 2016 + the GPT-2 byte-level alphabet. */
object ByteBpe {

  /** UTF-8 bytes of a pre-token as a Latin-1 symbol string: one char
    * (U+0000–U+00FF) per byte — single code points, so a byte-pair
    * merge table compiles through [[BpeKernel.compile]] verbatim. */
  def byteSyms(pretok: String): String = {
    val bs = pretok.getBytes(StandardCharsets.UTF_8)
    val cs = new Array[Char](bs.length)
    var i = 0
    while (i < bs.length) { cs(i) = (bs(i) & 0xFF).toChar; i += 1 }
    new String(cs)
  }

  /** Convenience for building byte-level merge tables from readable
    * strings: UTF-8-encode then Latin-1-wrap each side. */
  def rule(p1: String, p2: String): (String, String) =
    (byteSyms(p1), byteSyms(p2))
}

/** `gpt2_pretokens(text)`: the document's GPT-2 pre-token sequence as
  * an array column — the census/training surface ([[ByteBpeStats]] is
  * the fused counting sibling). Null text → empty array. */
case class Gpt2Pretokens(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(Gpt2Split.pretokenize(s)
      .map(UTF8String.fromString(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gpt2_pretokens"
}

object Gpt2Pretokens {
  def apply(text: Column): Column =
    GraftBridge.column(Gpt2Pretokens(GraftBridge.expression(text)))
}

/** `byte_syms(pretok)`: the pre-token's UTF-8 bytes as an array of
  * 1-char Latin-1 symbol strings — the initial training state of
  * byte-level BPE (the array image of [[ByteBpe.byteSyms]]). */
case class ByteSymsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = ByteBpe.byteSyms(input.asInstanceOf[UTF8String].toString)
    val out = new Array[AnyRef](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = UTF8String.fromString(String.valueOf(s.charAt(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_syms"
}

object ByteSymsExpr {
  def apply(pretok: Column): Column =
    GraftBridge.column(ByteSymsExpr(GraftBridge.expression(pretok)))
}

/** `byte_bpe_stats(text)`: per document, the GPT-2 pre-token count,
  * the UTF-8 byte count, and the exact byte-level BPE token count under
  * the compiled merge table — the real denomination of training-run
  * budgets. One zero-shuffle native expression; a per-(instance,
  * thread) pre-token cache exploits Zipfian repetition exactly like
  * [[BpeSubwords]]. */
case class ByteBpeStats(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_byte_tokens", LongType, nullable = false)))

  @transient private lazy val rules = BpeKernel.compile(merges)

  // pretoken -> (byte count, token count); instance-scoped like the
  // BpeSubwords cache (one merge table per instance, no cross-table
  // poisoning), cleared on overflow
  @transient private lazy val cache
      : ThreadLocal[java.util.HashMap[String, (Long, Long)]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, (Long, Long)]())

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val pts = Gpt2Split.pretokenize(s)
    val c = cache.get()
    if (c.size > BpeKernel.CacheCap) c.clear()
    var nBytes = 0L
    var nToks = 0L
    var i = 0
    while (i < pts.length) {
      val p = pts(i)
      var e = c.get(p)
      if (e == null) {
        val syms = ByteBpe.byteSyms(p)
        e = (syms.length.toLong,
          BpeKernel.encodeWord(syms, rules).length.toLong)
        c.put(p, e)
      }
      nBytes += e._1
      nToks += e._2
      i += 1
    }
    InternalRow(pts.length.toLong, nBytes, nToks)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_bpe_stats"
}

object ByteBpeStats {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(ByteBpeStats(GraftBridge.expression(text), merges))
}
