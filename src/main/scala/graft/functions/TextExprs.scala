package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native expression.
  *
  * Crawled corpora mix composed ("é" U+00E9) and decomposed ("e"+U+0301)
  * forms of the same text; every downstream content-keyed operator —
  * exact dedup (md5 of text), shingle hashing, fingerprints — treats them
  * as different documents unless ingestion canonicalizes first. NFC is
  * the standard choice (DuckDB ships `nfc_normalize`, so the oracle can
  * replay it).
  *
  * Spark has no normalization builtin, so this wraps
  * `java.text.Normalizer` (the JDK's ICU-derived implementation of
  * UAX #15). The hot path stays cheap: `Normalizer.isNormalized` is a
  * single quick-check pass that answers true for the overwhelmingly
  * ASCII/already-NFC majority of real corpora without allocating — only
  * rows that actually need recomposition pay for it. Codegen emits one
  * static call per row (the loop inside is JIT-compiled JDK code), so the
  * expression participates in whole-stage codegen like the hash
  * expressions in [[HashExprs]].
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = classOf[NfcNormalize].getName + "$.MODULE$"
      s"${ev.value} = $cls.nfc($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  def apply(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))

  /** Static entry point shared by eval and generated code. Skips the
    * String round-trip when the input is already NFC (the common case —
    * `isNormalized`'s quick-check scan allocates nothing for ASCII). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** ftfy-style MOJIBAKE repair as a native expression — the encoding-
  * damage cleanse step every web-scale text pipeline runs (the fix
  * ftfy popularized; public algorithm): text that was UTF-8 on the
  * wire but got DECODED as Latin-1/cp1252 shows the signature
  * `Ã©`/`â€™` digraphs. The repair inverts the mistake — map each char
  * back to the byte it mis-decoded from (identity for U+0000-U+00FF,
  * the published cp1252 table for the 27 specials like €/™/’ that
  * occupy 0x80-0x9F), then STRICT-decode those bytes as UTF-8.
  *
  * Fails closed three ways (the repair can never damage clean text):
  * a char outside both maps → unchanged; the byte image not valid
  * UTF-8 → unchanged; a decode that shortens nothing (pure ASCII —
  * no multibyte sequence ever fired) → unchanged. Consequence:
  * repaired output is a FIXED POINT (its own re-repair fails the
  * validity test), so the operator is idempotent — CleanseSpec pins
  * it. Single-pass: doubly-mojibaked text repairs one layer per
  * application, deliberately (looping belongs to the caller's
  * policy). Returns struct(text, repaired). */
/** Character-distribution entropy as a native expression — the
  * compressibility quality signal (gibberish and binary-junk pages score
  * high; template/boilerplate pages score low; both tails get cut in
  * web-corpus curation — the heuristic family of Rae et al. 2021's
  * quality gates). Order-0 Shannon entropy over UNICODE CODE POINTS:
  * H = ln(n) − (Σ c·ln c)/n nats, reported in bits.
  *
  * Engine-replayability discipline: the Σ c·ln c reduction runs in
  * ASCENDING code-point order (a TreeMap walk), so an oracle that sums
  * its per-character terms in the same order differs only by per-term
  * libm ulps — absorbed by the house 6-dp rounding rule (the x151
  * ln() precedent). Returns struct(n_distinct, ent_bits); empty input
  * yields (0, 0.0). One O(n log d) pass per row, no allocation beyond
  * the count map — a scalar kernel in the [[HashExprs]] mold. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("ent_bits", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val (d, e) = CharEntropy.entropyBits(input.asInstanceOf[UTF8String].toString)
    org.apache.spark.sql.catalyst.InternalRow(d, e)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  def apply(text: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(text)))

  private val Ln2 = java.lang.Math.log(2.0)

  /** The kernel: (distinct code points, order-0 entropy in bits), with
    * the Σ c·ln c fold pinned to ascending code-point order. */
  def entropyBits(s: String): (Int, Double) = {
    if (s.isEmpty) return (0, 0.0)
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1L
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * java.lang.Math.log(c)
    }
    val nats = java.lang.Math.log(n.toDouble) - sum / n.toDouble
    (counts.size(), nats / Ln2)
  }
}

case class FixMojibake(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("repaired", BooleanType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (out, rep) = FixMojibake.repair(s)
    org.apache.spark.sql.catalyst.InternalRow(
      if (rep) UTF8String.fromString(out)
      else input.asInstanceOf[UTF8String], rep)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {

  def apply(text: Column): Column =
    GraftBridge.column(FixMojibake(GraftBridge.expression(text)))

  /** cp1252's 0x80-0x9F specials, reverse-keyed (char → byte). The
    * five undefined slots (0x81/0x8D/0x8F/0x90/0x9D) are absent —
    * text containing their round-trip image is not cp1252 mojibake. */
  private val reverseCp1252: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** The repair kernel: (repaired text, did it fire). */
  def repair(s: String): (String, Boolean) = {
    if (s.isEmpty) return (s, false)
    val bytes = new Array[Byte](s.length)
    var i = 0
    var multibyte = false
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c < 0x100) c.toInt
        else reverseCp1252.getOrElse(c, -1)
      if (b < 0) return (s, false) // not a byte's mis-decode image
      if (b >= 0x80) multibyte = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!multibyte) return (s, false) // pure ASCII: nothing to repair
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a real repair SHORTENS (every multibyte sequence collapses);
      // equal length would mean the high bytes were all standalone
      // code points, i.e. not UTF-8 — REPORT already rejects that
      if (out.length < s.length) (out, true) else (s, false)
    } catch {
      case _: java.nio.charset.CharacterCodingException => (s, false)
    }
  }
}
