package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebVTT subtitle/caption ingest — the text half of audio-visual
  * training corpora (video platforms ship transcripts as WebVTT/SRT;
  * speech corpora align text to media through exactly these cue
  * timestamps). Complements the media-side probes
  * ([[graft.ext.Multimodal]] mp4/webm/ADTS walks): the probes read the
  * container clocks, this reads the transcript clock, and the two met
  * in a corpus join ARE the alignment audit.
  *
  * Parser follows the W3C WebVTT essentials a crawl actually hits:
  * `WEBVTT` signature line (optional trailing header text), blank-line
  * separated cue blocks, optional cue identifiers, `HH:MM:SS.mmm -->
  * HH:MM:SS.mmm` timings (MM:SS.mmm short form too) with optional cue
  * settings after the second timestamp, multi-line cue payloads, and
  * NOTE/STYLE blocks that must be skipped. CRLF and LF both occur in
  * the wild; both parse. Malformed cue blocks drop (the torn-record
  * discipline), never throw.
  *
  * Scale posture: one transcript = one payload; parsing is a narrow
  * per-row transform in the same task as the scan (the WARC/Html
  * shape) — cues never shuffle.
  */
object Vtt {

  final case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  private val ReTiming =
    """(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s+-->\s+(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})(?:\s+.*)?""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    (if (h == null) 0L else h.toLong) * 3600000L +
      m.toLong * 60000L + s.toLong * 1000L + f.toLong

  /** Parse one WebVTT document into its cues. */
  def parse(vtt: String): Seq[Cue] = {
    val lines = vtt.split("\r\n|\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WEBVTT")) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var i = 1
    var idx = 0
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = i
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        val block = lines.slice(blockStart, i)
        // a block is a comment/style ONLY per the W3C rule — NOTE alone
        // or NOTE followed by whitespace, STYLE exactly; a cue id that
        // merely STARTS with "NOTE" (e.g. "NOTES-on-intro") is a cue
        val head = block.head
        val isComment = head == "NOTE" || head.startsWith("NOTE ") ||
          head.startsWith("NOTE\t")
        val isStyle = head.trim == "STYLE"
        if (!isComment && !isStyle) {
          // optional cue identifier line before the timing line
          val tIx = block.indexWhere(l => ReTiming.pattern.matcher(l).matches())
          if (tIx >= 0 && tIx <= 1 && block.length > tIx) {
            block(tIx) match {
              case ReTiming(h1, m1, s1, f1, h2, m2, s2, f2) =>
                val text = block.drop(tIx + 1).mkString("\n")
                out += Cue(idx, ms(h1, m1, s1, f1), ms(h2, m2, s2, f2), text)
                idx += 1
              case _ => // unreachable: tIx matched
            }
          } // else: malformed block — drop, keep parsing
        }
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------------- write

  private def stamp(msTotal: Long): String = {
    val h = msTotal / 3600000L
    val m = msTotal / 60000L % 60
    val s = msTotal / 1000L % 60
    val f = msTotal % 1000L
    f"$h%02d:$m%02d:$s%02d.$f%03d"
  }

  /** Serialize cues as a WebVTT document (LF line endings). */
  def write(cues: Seq[Cue]): String =
    "WEBVTT\n" + cues.map(c =>
      s"\n${stamp(c.startMs)} --> ${stamp(c.endMs)}\n${c.text}\n").mkString

  /** documents → WebVTT transcripts: the doc's tokens in cues of
    * `wordsPerCue`, cue i spanning [i·1500 ms, i·1500+1400 ms] — every
    * field closed-form over the text so the oracle can rebuild the
    * parse without seeing a byte of VTT. */
  def vttFromDocs(docs: DataFrame, wordsPerCue: Int = 5): DataFrame = {
    val gen = udf((text: String) => {
      // Locale.ROOT: must match Spark's lower() / the DuckDB oracle on a
      // Turkish-locale JVM (default toLowerCase maps I to dotless ı)
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val cues = toks.grouped(wordsPerCue).zipWithIndex.map { case (ws, i) =>
        Cue(i, i * 1500L, i * 1500L + 1400L, ws.mkString(" "))
      }.toSeq
      write(cues)
    })
    docs.select(col("doc_id").as("media_id"), gen(col("text")).as("vtt"))
  }

  val cueSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("cue_idx", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("cue_text", StringType, nullable = false)))

  /** Parse (media_id, vtt) transcripts into cue rows — narrow, no
    * shuffle, cues in document order. */
  def parseDocVtts(vtts: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(cueSchema)
    vtts.select(col("media_id"), col("vtt")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        parse(r.getString(1)).iterator.map { c =>
          val n = c.text.split("\\s+").count(_.nonEmpty)
          Row(id, c.idx, c.startMs, c.endMs, n, c.text)
        }
      }
    }(enc)
  }
}
