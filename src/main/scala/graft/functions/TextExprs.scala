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
