package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the real
  * subword segmentation behind every token-budget decision a training
  * pipeline makes (packing, mixing, chunking, context-length audits),
  * replacing the whitespace/regex PROXY counts of
  * [[graft.ext.TextOps.tokenCount]]/`subwordCount`.
  *
  * Algorithm: a word starts as its character sequence; merge rules
  * `(left, right) → left+right` apply IN RANK ORDER, each rule merging
  * its adjacent occurrences left-to-right in one pass (Sennrich's
  * "apply the learned operations in the order they were learned").
  * For a WELL-FORMED merge table — every rule's components are single
  * characters or outputs of strictly earlier rules, which is exactly
  * what BPE training produces and what [[BpeKernel.compile]] enforces —
  * this is provably identical to the repeated-min-rank formulation
  * (GPT-2's encoder): merging rule k can only create adjacencies
  * involving its own output symbol, which no rule < k can reference,
  * so no earlier rule ever becomes applicable again.
  * [[graft.ext.BpeSpec]] cross-checks the two formulations.
  *
  * Everything is deterministic string algebra — no floats, no hashes —
  * so an independent engine (the DuckDB oracle) replays the merge loop
  * rule by rule and reproduces the exact segmentation.
  *
  * Scale shape: pure per-row expression, zero shuffle at any corpus
  * size; the merge table rides inside the expression tree (serialized
  * with the task closure — the broadcast-literal discipline of the ADC
  * tables). A per-thread word→segments cache exploits the Zipfian
  * repetition of natural-language words: the loop runs per DISTINCT
  * word per task, not per occurrence.
  */
object BpeKernel {

  /** A compiled rule: left symbol, right symbol, concatenation. */
  final case class Rule(p1: String, p2: String, merged: String)

  /** [[compile]] through a JVM-wide content-keyed cache — the
    * production-table path: the merge table rides into every task
    * inside the expression tree (broadcast-literal discipline), so
    * each deserialized task closure holds its OWN equal-but-distinct
    * Seq. Compiling per task costs ~0.4 s at 50k rules (measured,
    * ByteBpeProbe) and defeats the identity-keyed rank-map cache;
    * content keying returns ONE shared compiled array per distinct
    * table per executor JVM, so compile + rank-map build happen once
    * per executor, not once per task. Bounded like the rank cache. */
  def compileCached(merges: Seq[(String, String)]): Array[Rule] = {
    if (compiled.size > 64) compiled.clear()
    compiled.computeIfAbsent(merges.toVector, m => compile(m))
  }

  @transient private lazy val compiled =
    new java.util.concurrent.ConcurrentHashMap[
      Vector[(String, String)], Array[Rule]]()

  /** Validate well-formedness and precompute merged strings. Every
    * component must be a single character or the output of a STRICTLY
    * earlier rule, and outputs must be distinct and multi-char — the
    * invariants under which rank-order application ≡ repeated-min
    * (see object scaladoc). Fails closed: a malformed table would
    * silently produce a different segmentation than the published
    * algorithm. */
  def compile(merges: Seq[(String, String)]): Array[Rule] = {
    require(merges.nonEmpty, "BPE merge table is empty")
    val seen = scala.collection.mutable.HashSet.empty[String]
    val rules = merges.zipWithIndex.map { case ((p1, p2), r) =>
      def isOneCp(c: String): Boolean =
        c.nonEmpty && c.codePointCount(0, c.length) == 1
      def okComponent(c: String): Boolean = isOneCp(c) || seen.contains(c)
      require(p1.nonEmpty && p2.nonEmpty,
        s"BPE merge $r has an empty component")
      require(okComponent(p1) && okComponent(p2),
        s"BPE merge $r ($p1, $p2): components must be single code points " +
          "or outputs of earlier merges (well-formed table)")
      val m = p1 + p2
      require(m.codePointCount(0, m.length) > 1,
        s"BPE merge $r output is a single code point")
      require(seen.add(m), s"BPE merge $r duplicates output symbol '$m'")
      Rule(p1, p2, m)
    }
    rules.toArray
  }

  /** Initial symbol sequence of a word: one symbol per CODE POINT, not
    * per UTF-16 unit — supplementary characters (emoji, rare CJK) must
    * not split into lone surrogates, and this matches how Spark's
    * `substring`/`length` (the x105 training projection) and DuckDB's
    * `substr` (the oracle) count characters. */
  def codePoints(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Rule-count threshold above which [[encodeWord]] switches from the
    * rank-order rule SWEEP (O(rules·len) per distinct word — unbeatable
    * for the small in-engine trained tables, zero allocation) to the
    * GPT-2 encoder's min-rank loop over a precompiled pair→rank hash
    * (O(len²) per word, INDEPENDENT of rule count). At production
    * vocabulary size (50k merges) the sweep pays 50k scans per distinct
    * word; the hash path pays ~len lookups per round. The two loops are
    * provably equivalent on well-formed tables ([[compile]]'s
    * invariants; BpeSpec/ByteBpeSpec pin it), so the switch changes no
    * segmentation — only the constant. */
  val MinRankThreshold = 512

  // pair→rank hashes, one per compiled table (keyed by array identity —
  // each expression instance compiles once); built on first use
  @transient private lazy val rankMaps =
    new java.util.concurrent.ConcurrentHashMap[Array[Rule],
      java.util.HashMap[(String, String), Integer]]()

  private def rankMapOf(rules: Array[Rule])
      : java.util.HashMap[(String, String), Integer] = {
    // bound the identity-keyed cache: a long session constructing many
    // large-table expressions must not pin every table forever
    if (rankMaps.size > 64) rankMaps.clear()
    rankMaps.computeIfAbsent(rules, rs => {
      val m = new java.util.HashMap[(String, String), Integer](
        rs.length * 2)
      var i = 0
      while (i < rs.length) { m.put((rs(i).p1, rs(i).p2), i); i += 1 }
      m
    })
  }

  /** Greedy BPE segmentation of one word: rank-order merge loop for
    * small tables, min-rank hash loop past [[MinRankThreshold]]. */
  def encodeWord(word: String, rules: Array[Rule]): Array[String] = {
    if (rules.length >= MinRankThreshold)
      return encodeWordByRank(word, rules, rankMapOf(rules))
    val syms = codePoints(word)
    val n = syms.length
    if (n == 0) return Array.empty[String]
    var len = n
    var r = 0
    while (r < rules.length && len > 1) {
      val rule = rules(r)
      var read = 0
      var write = 0
      while (read < len) {
        if (read + 1 < len && syms(read) == rule.p1 &&
          syms(read + 1) == rule.p2) {
          syms(write) = rule.merged
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      len = write
      r += 1
    }
    java.util.Arrays.copyOfRange(syms, 0, len)
  }

  /** The min-rank loop over a precompiled pair→rank hash — the
    * production-table hot path of [[encodeWord]]. */
  private def encodeWordByRank(word: String, rules: Array[Rule],
      rank: java.util.HashMap[(String, String), Integer])
      : Array[String] = {
    var syms = codePoints(word)
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of the best pair, left to right
        val rule = rules(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == rule.p1 &&
            syms(j + 1) == rule.p2) { out += rule.merged; j += 2 }
          else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length <= 1
      }
    }
    syms
  }

  /** Reference repeated-min-rank formulation (the GPT-2 encoder loop) —
    * used by the spec to assert the equivalence the oracle relies on;
    * identical algebra to [[encodeWordByRank]] minus the cached map. */
  def encodeWordMinRank(word: String, rules: Array[Rule]): Array[String] = {
    val rank = new java.util.HashMap[(String, String), Integer](
      rules.length * 2)
    rules.iterator.zipWithIndex.foreach { case (r, i) =>
      rank.put((r.p1, r.p2), i)
    }
    encodeWordByRank(word, rules, rank)
  }

  /** The shared text→subwords pass: lowercase, whitespace-split (the
    * `split(lower(text), "\\s+")` convention every text operator uses,
    * empties dropped), then per-word greedy BPE through the CALLER'S
    * word cache (Zipf: the same words recur constantly). The cache must
    * belong to one (merge table, thread) — a table-blind shared cache
    * would serve one tokenizer's segmentations to another (x98's
    * fixture table vs x106's trained table in one JVM). The cap bounds
    * task memory and simply resets on overflow. */
  val CacheCap = 1 << 16

  def encodeText(text: String, rules: Array[Rule],
                 cache: java.util.HashMap[String, Array[String]])
      : Array[Array[String]] = {
    val words = TokenSplit.tokenize(text)
    if (cache.size > CacheCap) cache.clear()
    words.map { w =>
      var r = cache.get(w)
      if (r == null) { r = encodeWord(w, rules); cache.put(w, r) }
      r
    }
  }
}

/** `bpe_subwords(text)`: the document's full subword-token sequence —
  * lowercased whitespace words, each greedily BPE-segmented against the
  * compiled merge table, concatenated in order. `size()` of it is the
  * exact token count that denominates packing / mixing / chunking
  * budgets. */
case class BpeSubwords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rules = BpeKernel.compileCached(merges)

  // per-(instance, thread) word cache: instances are per-task after
  // deserialization, and each instance carries exactly one merge table,
  // so entries can never leak across tokenizers
  @transient private lazy val cache
      : ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[String]]())

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val segs = BpeKernel.encodeText(s, rules, cache.get())
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](s.length / 4 + 4)
    segs.foreach(_.foreach(t => out += UTF8String.fromString(t)))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_subwords"
}

object BpeSubwords {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeSubwords(GraftBridge.expression(text), merges))
}

/** `bpe_explode(text)`: the GENERATOR (UDTF-shaped) sibling of
  * [[BpeSubwords]] — one output row per subword token, with the
  * 0-based index of the word it came from: the row shape census /
  * vocabulary queries consume directly, without an intermediate array
  * column + `explode` pass. Plans as a `Generate` exactly like the
  * built-in explode family; null/empty text generates nothing. */
case class BpeExplode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("word_idx", IntegerType, nullable = false),
    StructField("subword", StringType, nullable = false)))

  @transient private lazy val rules = BpeKernel.compileCached(merges)
  @transient private lazy val cache
      : ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[String]]())

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val segs = BpeKernel.encodeText(
        t.asInstanceOf[UTF8String].toString, rules, cache.get())
      val out = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.catalyst.InternalRow](segs.length * 2)
      var i = 0
      while (i < segs.length) {
        val ws = segs(i)
        var j = 0
        while (j < ws.length) {
          out += org.apache.spark.sql.catalyst.InternalRow(
            i, UTF8String.fromString(ws(j)))
          j += 1
        }
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_explode"
}

object BpeExplode {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeExplode(GraftBridge.expression(text), merges))
}
