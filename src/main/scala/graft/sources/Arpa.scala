package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** ARPA n-gram language-model file — the Doug B. Paul interchange
  * format every n-gram toolchain reads and writes (SRILM's `ngram`,
  * KenLM's `lmplz`/`build_binary`, CMU-Cambridge SLM): a `\data\`
  * header with per-order counts, then `\N-grams:` sections of
  *
  *   `log10prob<TAB>w1 [w2 …][<TAB>log10backoff]`
  *
  * terminated by `\end\`. CCNet-style perplexity filtering ships its
  * KenLM models in exactly this format, so the KN tier's model half
  * (x144's chain) gets a real artifact boundary: train → write ARPA →
  * reload → score, the BM25/DSIR stored-lifecycle discipline.
  *
  * QUANTIZATION CONTRACT: every log10 value is written HALF-UP at
  * 9 dp (`BigDecimal.setScale(9)` — the suite's libm rule, matching
  * Spark's and DuckDB's `round(x, 9)`), rendered as the exact 9-dp
  * decimal string. Parsing that string back yields the double nearest
  * the 9-dp decimal — the SAME double the writer's in-memory model
  * holds — so write → read is EXACT on the quantized values and the
  * artifact is byte-deterministic. Unigrams missing a continuation
  * statistic carry `-99` (the SRILM zeroprob convention); the backoff
  * field is OMITTED for words that never head a bigram (log-backoff 0
  * = multiplier 1), exercising the format's optional-field rule. */
object Arpa {

  /** Bigram model: `unigrams(w → (log10 p_cont, log10 backoff))`,
    * `bigrams((w1, w2) → log10 p)`. Values are 9-dp-quantized. */
  case class Model(unigrams: Map[String, (Double, Double)],
                   bigrams: Map[(String, String), Double])

  /** HALF-UP 9-dp quantization of a double — the value every log10
    * in the artifact carries. */
  def q9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  private def fmt(x: Double): String =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).toPlainString

  def render(m: Model): String = {
    val sb = new StringBuilder
    sb.append("\\data\\\n")
    sb.append(s"ngram 1=${m.unigrams.size}\n")
    sb.append(s"ngram 2=${m.bigrams.size}\n\n")
    sb.append("\\1-grams:\n")
    m.unigrams.toSeq.sortBy(_._1).foreach { case (w, (lp, lbow)) =>
      require(!w.exists(_.isWhitespace),
        s"token '$w' contains whitespace — unrepresentable in ARPA")
      if (lbow == 0.0) sb.append(s"${fmt(lp)}\t$w\n")
      else sb.append(s"${fmt(lp)}\t$w\t${fmt(lbow)}\n")
    }
    sb.append("\n\\2-grams:\n")
    m.bigrams.toSeq.sortBy { case ((a, b), _) => (a, b) }
      .foreach { case ((w1, w2), lp) =>
        sb.append(s"${fmt(lp)}\t$w1 $w2\n")
      }
    sb.append("\n\\end\\\n")
    sb.toString
  }

  def parse(text: String): Model = {
    val lines = text.split("\n", -1).iterator.map(_.stripLineEnd)
    var section = 0 // 0 = header, 1 = unigrams, 2 = bigrams
    val uni = Map.newBuilder[String, (Double, Double)]
    val bi = Map.newBuilder[(String, String), Double]
    val SectionRe = """\\(\d+)-grams:""".r
    lines.foreach { line =>
      val t = line.trim
      if (t == "\\1-grams:") section = 1
      else if (t == "\\2-grams:") section = 2
      else if (t == "\\end\\") section = 3
      else SectionRe.findFirstMatchIn(t) match {
        // a higher-order section silently parsed as bigram rows would
        // misread every external trigram+ model — fail LOUD instead
        case Some(mm) =>
          throw new IllegalArgumentException(
            s"unsupported ARPA order ${mm.group(1)} (this reader is bigram)")
        case None =>
      }
      if (t.nonEmpty && !t.startsWith("\\") && !t.startsWith("ngram")
               && section > 0 && section < 3) {
        val f = t.split("\t")
        if (section == 1) {
          val lbow = if (f.length > 2) f(2).toDouble else 0.0
          uni += f(1) -> ((f(0).toDouble, lbow))
        } else {
          val ws = f(1).split(" ")
          bi += ((ws(0), ws(1))) -> f(0).toDouble
        }
      }
    }
    Model(uni.result(), bi.result())
  }

  def write(path: String, m: Model): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, render(m).getBytes(StandardCharsets.UTF_8))
  }

  def read(path: String): Model =
    parse(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))
}
