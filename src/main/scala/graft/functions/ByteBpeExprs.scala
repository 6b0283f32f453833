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

  /** GPT-2's `bytes_to_unicode` visible alphabet (encoder.py): the 188
    * printable ASCII/Latin-1 bytes map to themselves; the remaining 68
    * (controls, space, DEL, 0xA0, 0xAD) map to U+0100+k in byte order —
    * which is why the space byte renders as 'Ġ' (U+0120) in every
    * published merges.txt. Total bijection byte ↔ visible char. */
  val byteToVisible: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var k = 0
    (0 until 256).map { b =>
      if (direct(b)) b.toChar
      else { val c = (256 + k).toChar; k += 1; c }
    }.toArray
  }

  private val visibleToByte: Map[Char, Int] =
    byteToVisible.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Decode one merges.txt token (visible alphabet) into the internal
    * Latin-1 byte-symbol string [[BpeKernel.compile]] consumes. Fails
    * closed on characters outside the 256-char alphabet. */
  def decodeVisible(tok: String): String = {
    val cs = new Array[Char](tok.length)
    var i = 0
    while (i < tok.length) {
      cs(i) = visibleToByte.getOrElse(tok(i),
        throw new IllegalArgumentException(
          f"not a GPT-2 visible-alphabet char: U+${tok(i).toInt}%04X " +
            s"in '$tok'")).toChar
      i += 1
    }
    new String(cs)
  }

  private def encodeVisible(syms: String): String =
    syms.map(c => byteToVisible(c.toInt)).mkString

  /** Parse a GPT-2/RoBERTa-format `merges.txt` (the format tiktoken's
    * published BPE vocabularies and every HuggingFace byte-level
    * tokenizer ship): optional `#version` header, then one
    * space-separated visible-alphabet pair per line in rank order.
    * Tokens never contain a RAW space (the space byte renders as 'Ġ'),
    * so the single-space split is exact. Returns the internal
    * byte-symbol pairs ready for [[BpeKernel.compile]].
    *
    * The `#version` header is skipped when the FIRST NON-EMPTY line
    * carries it (HuggingFace tokenizers' contract, made robust to a
    * leading UTF-8 BOM or blank line — without this, '#version: 0.2'
    * behind a BOM silently parsed as the bogus rule ("#version:",
    * "0.2")). A legitimate merge whose rendered left token begins with
    * `#version` (reachable on code/markdown corpora) still parses as a
    * rule anywhere below that first line. */
  def parseGpt2Merges(content: String): Seq[(String, String)] = {
    val body =
      if (content.startsWith("\uFEFF")) content.substring(1) else content
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val rules =
      if (lines.headOption.exists(_.startsWith("#version"))) lines.tail
      else lines
    rules.map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
        s"malformed merges line (want 'A B'): '$l'")
      (decodeVisible(l.substring(0, sp)),
        decodeVisible(l.substring(sp + 1)))
    }
  }

  /** Writer dual of [[parseGpt2Merges]] — round-trips any well-formed
    * byte-level table through the published file format. */
  def renderGpt2Merges(merges: Seq[(String, String)]): String =
    ("#version: 0.2" +: merges.map { case (a, b) =>
      encodeVisible(a) + " " + encodeVisible(b)
    }).mkString("\n")

  /** The `vocab.json` half of the GPT-2 tokenizer directory
    * (`vocab.json` + `merges.txt` is the published pair every
    * HF-format GPT-2/RoBERTa tokenizer ships): visible-alphabet token
    * string → id, ids being exactly [[vocabOfMerges]]' positions
    * (bytes 0–255, then one id per merge in rank order). Canonical
    * render — entries in id order — so equal tables give byte-equal
    * files. JSON escaping matters here: printable ASCII survives the
    * visible encoding UNCHANGED, so tokens containing `"` or `\\` are
    * legal vocabulary and must escape. */
  def renderGpt2Vocab(merges: Seq[(String, String)]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    vocabOfMerges(merges).zipWithIndex.map { case (tok, id) =>
      "\"" + esc(encodeVisible(tok)) + "\":" + id
    }.mkString("{", ",", "}")
  }

  /** Parser dual of [[renderGpt2Vocab]]: a flat JSON object of
    * visible-token → integer id (any key order, whitespace, and the
    * standard string escapes). Returns the visible → id map; compose
    * with [[decodeVisible]] for internal strings. */
  def parseGpt2Vocab(json: String): Map[String, Int] = {
    var i = 0
    def ws(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    def str(): String = {
      require(json(i) == '"', s"expected string at $i"); i += 1
      val sb = new StringBuilder
      while (json(i) != '"') {
        if (json(i) == '\\') {
          i += 1
          json(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '/' => sb.append('/')
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'u' =>
              sb.append(Integer.parseInt(json.substring(i + 1, i + 5), 16)
                .toChar)
              i += 4
            case c => throw new IllegalArgumentException(s"escape \\$c")
          }
          i += 1
        } else { sb.append(json(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    ws()
    require(i < json.length && json(i) == '{', "vocab.json: not an object")
    i += 1
    val b = Map.newBuilder[String, Int]
    ws()
    if (i < json.length && json(i) == '}') return b.result()
    var more = true
    while (more) {
      ws(); val k = str(); ws()
      require(json(i) == ':', s"expected : at $i"); i += 1; ws()
      val st = i
      while (i < json.length && (json(i).isDigit || json(i) == '-')) i += 1
      b += k -> json.substring(st, i).toInt
      ws()
      if (i < json.length && json(i) == ',') i += 1
      else {
        require(i < json.length && json(i) == '}', s"expected }} at $i")
        more = false
      }
    }
    b.result()
  }

  /** Parse a tiktoken-format rank file (the `.tiktoken` encoding the
    * tiktoken library publishes for the GPT-3.5/4 vocabularies): one
    * `base64(token_bytes) rank` pair per line. Returns token (Latin-1
    * byte-symbol string) → rank. */
  def parseTiktokenRanks(content: String): Map[String, Int] = {
    val b64 = java.util.Base64.getDecoder
    content.linesIterator.filter(_.nonEmpty).map { l =>
      val sp = l.lastIndexOf(' ')
      require(sp > 0, s"malformed tiktoken line (want 'b64 rank'): '$l'")
      val bytes = b64.decode(l.substring(0, sp))
      val cs = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { cs(i) = (bytes(i) & 0xFF).toChar; i += 1 }
      new String(cs) -> l.substring(sp + 1).toInt
    }.toMap
  }

  /** Writer dual of [[parseTiktokenRanks]]. */
  def renderTiktokenRanks(ranks: Map[String, Int]): String = {
    val b64 = java.util.Base64.getEncoder
    ranks.toSeq.sortBy(_._2).map { case (tok, r) =>
      val bytes = new Array[Byte](tok.length)
      var i = 0
      while (i < tok.length) { bytes(i) = tok(i).toByte; i += 1 }
      b64.encodeToString(bytes) + " " + r
    }.mkString("\n")
  }

  /** The rank vocabulary a merge table IMPLIES — how the GPT-2 merges
    * and the tiktoken ranks relate: the 256 single bytes take ranks
    * 0–255 (byte order), merge outputs take 256 + merge index. Under
    * this vocabulary tiktoken's rank-based encoder segments exactly
    * like the merge loop ([[encodeWordByRanks]]; ByteBpeSpec pins the
    * equivalence corpus-wide). */
  def ranksFromMerges(merges: Seq[(String, String)]): Map[String, Int] = {
    val singles = (0 until 256).map(b => b.toChar.toString -> b)
    val outs = merges.zipWithIndex.map { case ((a, b), i) =>
      (a + b) -> (256 + i) }
    (singles ++ outs).toMap
  }

  /** tiktoken's `byte_pair_merge`: repeatedly merge the adjacent pair
    * whose CONCATENATION has the lowest vocabulary rank, until no
    * adjacent concatenation is in the vocabulary — BPE expressed over
    * ranks alone, no merge-pair table. On a vocabulary built by BPE
    * training (every ≥2-byte token is the concatenation of exactly the
    * two tokens its merge fused, ranked in training order) this yields
    * the same segmentation as the merge loop. Ties (impossible in a
    * well-formed vocab — ranks are distinct) break leftmost. */
  def encodeWordByRanks(syms: String, ranks: Map[String, Int])
      : Array[String] = {
    var parts = BpeKernel.codePoints(syms)
    var done = parts.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < parts.length - 1) {
        ranks.get(parts(i) + parts(i + 1)).foreach { r =>
          if (r < best) { best = r; at = i }
        }
        i += 1
      }
      if (at < 0) done = true
      else {
        // merge ALL adjacent occurrences of the winning PAIR left to
        // right (the merge loop's per-rule sweep image; pair equality,
        // not concatenation equality — two different splits can
        // concatenate to the same string)
        val p1 = parts(at); val p2 = parts(at + 1)
        val merged = p1 + p2
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < parts.length) {
          if (j + 1 < parts.length && parts(j) == p1 &&
            parts(j + 1) == p2) { out += merged; j += 2 }
          else { out += parts(j); j += 1 }
        }
        parts = out.toArray
        done = parts.length <= 1
      }
    }
    parts
  }

  /** The id → token inverse of [[ranksFromMerges]], as a dense array:
    * ids 0–255 are the single bytes (byte order), id 256+i is merge
    * i's output — the decode table of the trained vocabulary. */
  def vocabOfMerges(merges: Seq[(String, String)]): Array[String] = {
    val v = new Array[String](256 + merges.size)
    var b = 0
    while (b < 256) { v(b) = b.toChar.toString; b += 1 }
    var i = 0
    merges.foreach { case (a, c) => v(256 + i) = a + c; i += 1 }
    v
  }

  /** DECODE token ids back to text under a trained vocabulary — the
    * inverse the training-export lifecycle needs audited: byte-level
    * BPE is lossless by construction (tokens partition the byte
    * stream), so `decodeIds(encode(text)) == text` for ANY input, and
    * a merge-table/ordering bug anywhere surfaces as a round-trip
    * mismatch. Ids outside the vocabulary (possible only on foreign
    * or corrupted id streams) decode to U+FFFD rather than throwing —
    * the torn-tail discipline carried to the id layer. */
  def decodeIds(ids: Array[Int], vocab: Array[String]): String = {
    val sb = new java.lang.StringBuilder(ids.length * 2)
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id >= 0 && id < vocab.length) sb.append(vocab(id))
      else sb.append("\u00EF\u00BF\u00BD") // U+FFFD's UTF-8 bytes as syms
      i += 1
    }
    val syms = sb.toString
    val bytes = new Array[Byte](syms.length)
    var j = 0
    while (j < syms.length) { bytes(j) = syms.charAt(j).toByte; j += 1 }
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Pad a trained table to `n` rules with INERT rules over the 8
    * byte values 0xF8–0xFF — bytes no valid UTF-8 encoding ever emits,
    * so [[byteSyms]] of any real string never contains them and the
    * pad rules can never fire: segmentation under the padded table is
    * IDENTICAL to the trained prefix (ByteBpeSpec-pinned). This is the
    * measurement scaffold for the production-size (50k-rule) kernel-
    * cost question — the pad isolates per-rule overhead from merge
    * behavior. Enumeration is breadth-first over strings on the inert
    * alphabet (rule for string `w` = (init(w), last(w))), so tokens
    * stay SHORT (≤ 6 bytes at 50k rules — realistic: published GPT-2
    * tokens are ≤ ~20 bytes; a first cut with ever-growing chains put
    * 156M chars in the table and made render/parse look quadratic),
    * every output is distinct, and every left component is a strictly
    * earlier output ([[BpeKernel.compile]]'s invariants). */
  def padWithInertRules(trained: Seq[(String, String)], n: Int)
      : Seq[(String, String)] = {
    require(n >= trained.size, s"n=$n below trained size ${trained.size}")
    val inv = (0xF8 to 0xFF).map(_.toChar)
    val pad = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var frontier: Vector[String] = inv.map(_.toString).toVector
    while (trained.size + pad.size < n) {
      val next = Vector.newBuilder[String]
      var i = 0
      while (i < frontier.length && trained.size + pad.size < n) {
        val w = frontier(i)
        var j = 0
        while (j < inv.length && trained.size + pad.size < n) {
          pad += ((w, inv(j).toString))
          next += (w + inv(j))
          j += 1
        }
        i += 1
      }
      frontier = next.result()
    }
    trained ++ pad
  }}

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
  * [[BpeSubwords]].
  *
  * The table rides in the tree as ONE rendered merges.txt STRING, not
  * a Seq of 2·n small strings: at production size (50k rules) the Seq
  * form cost ~7 s/query in closure serde alone (measured,
  * ByteBpeProbe) — 100k java strings serialized per task — where one
  * ~0.5 MB string is a single buffer copy; [[BpeKernel.compileCached]]
  * keyed on that string compiles once per executor JVM. */
case class ByteBpeStats(child: Expression, mergesTxt: String)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_byte_tokens", LongType, nullable = false)))

  @transient private lazy val rules =
    BpeKernel.compileCached(ByteBpe.parseGpt2Merges(mergesTxt))

  // the table must NOT render into plan strings: treeString repeats
  // the expression once per operator/column reference, and Catalyst
  // truncates Seq arguments but never String ones — a 50k-rule table
  // (~0.6 MB) OOMed the driver in AQE's explain before this override
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<merges:${mergesTxt.length}B>")

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
    GraftBridge.column(ByteBpeStats(GraftBridge.expression(text),
      ByteBpe.renderGpt2Merges(merges)))
}

/** `byte_bpe_ids(text)`: the document's TOKEN-ID SEQUENCE under the
  * compiled trained table — ids per [[ByteBpe.ranksFromMerges]] (0–255
  * the single bytes, 256+i merge i's output), the column a training
  * export actually writes. Same table-as-one-string serde and
  * per-(instance, thread) pre-token cache as [[ByteBpeStats]]; null
  * text → empty array (no tokens, not null). */
case class ByteBpeIds(child: Expression, mergesTxt: String)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val rules =
    BpeKernel.compileCached(ByteBpe.parseGpt2Merges(mergesTxt))
  @transient private lazy val rankOf: Map[String, Int] =
    ByteBpe.ranksFromMerges(ByteBpe.parseGpt2Merges(mergesTxt))

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<merges:${mergesTxt.length}B>")

  @transient private lazy val cache
      : ThreadLocal[java.util.HashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[Int]]())

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val pts = Gpt2Split.pretokenize(s)
    val c = cache.get()
    if (c.size > BpeKernel.CacheCap) c.clear()
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 2 + 4)
    var i = 0
    while (i < pts.length) {
      val p = pts(i)
      var ids = c.get(p)
      if (ids == null) {
        // every token the merge loop emits is a single byte or a merge
        // output, so the rank lookup is total on well-formed tables
        ids = BpeKernel.encodeWord(ByteBpe.byteSyms(p), rules)
          .map(t => rankOf(t))
        c.put(p, ids)
      }
      var j = 0
      while (j < ids.length) { out += ids(j); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_bpe_ids"
}

object ByteBpeIds {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(ByteBpeIds(GraftBridge.expression(text),
      ByteBpe.renderGpt2Merges(merges)))
}

/** `byte_bpe_decode(ids)`: token ids back to text under the same
  * trained vocabulary — the detokenization audit surface
  * ([[ByteBpe.decodeIds]] as a column). Byte-level BPE is lossless, so
  * `byte_bpe_decode(byte_bpe_ids(text)) = text` for any input; foreign
  * ids decode to U+FFFD rather than throwing. */
case class ByteBpeDecode(child: Expression, mergesTxt: String)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StringType

  @transient private lazy val vocab =
    ByteBpe.vocabOfMerges(ByteBpe.parseGpt2Merges(mergesTxt))

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<merges:${mergesTxt.length}B>")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ids = arr.toIntArray()
    UTF8String.fromString(ByteBpe.decodeIds(ids, vocab))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "byte_bpe_decode"
}

object ByteBpeDecode {
  def apply(ids: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(ByteBpeDecode(GraftBridge.expression(ids),
      ByteBpe.renderGpt2Merges(merges)))
}
