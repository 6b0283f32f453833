package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Warc

/** HTML → training-text extraction — the step between a WARC crawl scan
  * ([[graft.sources.Warc]]) and every text gate in [[Curation]]: strip
  * markup, scripts, styles and comments, decode character entities,
  * collapse whitespace, and surface the structural signals (title, link
  * count, text density) that web-corpus quality filters key on
  * (jusText/trafilatura-style, here the deterministic core of that
  * family rather than a DOM heuristic).
  *
  * The reference has no crawl side (its inputs are GEE collections);
  * this module exists because a 100 TB training corpus starts as HTML
  * and the engine must own the HTML→text hop, not outsource it.
  *
  * Everything here is a per-row scalar transform — the extraction stage
  * is a narrow projection over the record scan with NO exchange; at
  * cluster scale it rides inside the same task that inflated the WARC
  * member. Branch-heavy string parsing is exactly the documented UDF
  * carve-out (the [[graft.ops.Utm]] rule): the surrounding pipeline
  * stays Column algebra.
  */
object Html {

  // -------------------------------------------------------------- extract

  private val ReComment = "(?s)<!--.*?-->".r
  private val ReScript = "(?is)<script\\b[^>]*>.*?</script>".r
  private val ReStyle = "(?is)<style\\b[^>]*>.*?</style>".r
  private val ReTitle = "(?is)<title[^>]*>(.*?)</title>".r
  private val ReBody = "(?is)<body[^>]*>(.*)</body>".r
  private val ReTag = "(?s)<[^>]*>".r
  private val ReHead = "(?is)<head\\b[^>]*>.*?</head>".r
  private val ReTitleElem = "(?is)<title[^>]*>.*?</title>".r
  private val ReLink = "(?is)<a\\s[^>]*href".r
  // The exact RE2 \s class, so the DuckDB oracle's '\s+' collapse is the
  // same operation (java.util.regex \s additionally matches \x0B — using
  // it would silently diverge on vertical tabs).
  private val ReWs = "[ \\t\\n\\r\\f]+".r
  private val ReEntity = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r

  /** Decode the HTML 4 core entities plus numeric references, one pass
    * left-to-right (decoded output is never re-scanned, so pre-escaped
    * corpus text round-trips exactly). Unknown named entities pass
    * through verbatim — a crawl contains broken markup, not exceptions. */
  def decodeEntities(s: String): String =
    ReEntity.replaceAllIn(s, m => {
      val e = m.group(1)
      val out =
        if (e.startsWith("#x") || e.startsWith("#X"))
          parseInt(e.drop(2), 16).filter(isScalar)
            .map(cp => new String(Character.toChars(cp))).getOrElse(m.matched)
        else if (e.startsWith("#"))
          parseInt(e.drop(1), 10).filter(isScalar)
            .map(cp => new String(Character.toChars(cp))).getOrElse(m.matched)
        else e match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case _ => m.matched
        }
      scala.util.matching.Regex.quoteReplacement(out)
    })

  private def parseInt(s: String, radix: Int): Option[Int] =
    try Some(java.lang.Integer.parseInt(s, radix)) catch {
      case _: NumberFormatException => None
    }

  /** Valid scalar code point: in range and NOT a surrogate — a numeric
    * reference to U+D800–DFFF would otherwise materialize a lone
    * surrogate (an ill-formed String that mangles on any UTF-8 hop). */
  private def isScalar(cp: Int): Boolean =
    Character.isValidCodePoint(cp) &&
      (cp < Character.MIN_SURROGATE || cp > Character.MAX_SURROGATE)

  private def collapse(s: String): String = ReWs.replaceAllIn(s, " ").trim

  final case class Extracted(title: String, nLinks: Int, text: String)

  /** Extract (title, link count, visible text) from one HTML document.
    * Order of operations matters and is pinned: script/style out FIRST
    * with their content (per the HTML parsing rules, `<!--` inside a
    * script is not a comment — stripping comments first would let a
    * script-string `"<!--"` swallow real page text), then comments
    * (which also kills any commented-out script the first pass could
    * not match), then the body is isolated — when no `<body>…</body>`
    * pair exists the fallback strips the head and any `<title>` element
    * so title text still never leaks into body text — tags become
    * separators, entities decode LAST (so `&lt;p&gt;` in content can
    * never be re-parsed as markup). */
  def extract(html: String): Extracted = {
    val noScript = ReStyle.replaceAllIn(ReScript.replaceAllIn(html, " "), " ")
    val noComment = ReComment.replaceAllIn(noScript, " ")
    val title = ReTitle.findFirstMatchIn(noComment)
      .map(m => collapse(decodeEntities(m.group(1)))).getOrElse("")
    val nLinks = ReLink.findAllMatchIn(noComment).length
    val bodyHtml = ReBody.findFirstMatchIn(noComment).map(_.group(1))
      .getOrElse(ReTitleElem.replaceAllIn(
        ReHead.replaceAllIn(noComment, " "), " "))
    val text = collapse(decodeEntities(ReTag.replaceAllIn(bodyHtml, " ")))
    Extracted(title, nLinks, text)
  }

  val extractSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("n_links", IntegerType, nullable = false),
    StructField("n_chars_text", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Extraction over WARC records: keep `response` rows with an HTML
    * content type, decode the entity body as UTF-8, extract. Expects the
    * [[Warc.recordSchema]] plus a `media_id` column; narrow, no shuffle. */
  def extractFromRecords(records: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(extractSchema)
    records
      .filter(col("record_type") === "response" &&
        lower(col("http_content_type")).startsWith("text/html"))
      .select(col("media_id"), col("html"))
      .mapPartitions { it =>
        it.map { r =>
          val e = extract(new String(r.getAs[Array[Byte]](1), UTF_8))
          Row(r.getLong(0), e.title, e.nLinks, e.text.length, e.text)
        }
      }(enc)
  }

  /** [[decodeEntities]]' NAMED-core subset as pure Column algebra —
    * the HTML 4 core set (`&amp; &lt; &gt; &quot; &apos; &nbsp;`) that
    * dominates entity use in crawl text, decoded in one left-to-right
    * pass: split on `&`, rewrite each segment head by prefix match,
    * rejoin (no replacement contains `&`, so decoded output is never
    * re-scanned — `&amp;lt;` yields `&lt;`, exactly the driver-side
    * decoder's round-trip guarantee). Unknown and NUMERIC references
    * pass through verbatim: Spark's `chr` is mod-256 ASCII where
    * DuckDB's is a Unicode code point, so a column-level numeric
    * decode would silently diverge between engines — full numeric
    * decoding stays with the driver-side [[decodeEntities]] used in
    * [[extract]]. Codegen'd, zero shuffle, exact DuckDB twin
    * (string_split / list_transform / prefix CASE). */
  def decodeEntitiesCol(c: Column): Column = {
    val named = Seq("amp;" -> "&", "lt;" -> "<", "gt;" -> ">",
      "quot;" -> "\"", "apos;" -> "'", "nbsp;" -> " ")
    val parts = split(c, "&")
    val segs = transform(slice(parts, lit(2), size(parts) - 1), { p =>
      named.foldRight(concat(lit("&"), p)) { case ((ent, out), els) =>
        when(p.startsWith(ent),
          concat(lit(out), p.substr(lit(ent.length + 1), length(p))))
          .otherwise(els)
      }
    })
    concat(element_at(parts, 1), array_join(segs, ""))
  }

  /** (href, anchor-text) pairs from HTML response records — the edge
    * layer of a link graph as it comes out of a REAL archive: the
    * anchor text pointing AT a page is the classic external relevance
    * signal (it describes the target in the linkers' words), and the
    * href set is what [[graft.ext.UrlOps.resolveRef]] turns into
    * frontier URLs. One narrow explode per record; the anchor text is
    * page text, so the core named entities decode via
    * [[decodeEntitiesCol]] (numeric references pass through — its
    * documented boundary), while the href passes through verbatim
    * (URLs carry their own escaping — [[graft.ext.UrlOps.pctNormalize]]
    * owns that layer). Column algebra throughout — regexp_extract_all
    * for the two capture groups, zipped and posexploded; no UDF. */
  def anchorsFromRecords(records: DataFrame): DataFrame = {
    val pat = "<a\\s+href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
    records
      .filter(col("record_type") === "response" &&
        lower(col("http_content_type")).startsWith("text/html"))
      .select(col("media_id"), col("target_uri").as("base_url"),
        decode(col("html"), "UTF-8").as("h"))
      .withColumn("hrefs", regexp_extract_all(col("h"), lit(pat), lit(1)))
      .withColumn("anchors",
        regexp_extract_all(col("h"), lit(pat), lit(2)))
      .select(col("media_id"), col("base_url"),
        posexplode(arrays_zip(col("hrefs"), col("anchors")))
          .as(Seq("link_i", "z")))
      .select(col("media_id"), col("base_url"), col("link_i"),
        col("z").getField("hrefs").as("href"),
        decodeEntitiesCol(col("z").getField("anchors")).as("anchor"))
  }

  /** Per-DESTINATION anchor-term census over a resolved link table —
    * the classic external relevance signal one layer above edge
    * extraction: the terms other pages use when linking AT a domain
    * (what anchor-text retrieval — BM25 over anchors, x34's machinery —
    * indexes), split by internal vs cross-domain links (self-links
    * describe navigation; external ones confer authority). Expects
    * `(doc_id, src_domain, dst_domain, anchor)` where `anchor` is
    * ALREADY-DECODED text — [[anchorsFromRecords]] emits exactly that,
    * so the link layer composes with ONE decode point; raw fixture or
    * archive text must pass through [[decodeEntitiesCol]] first (a
    * second decode here would double-unescape `&amp;lt;` to `<`,
    * breaking the decoder's one-pass round-trip guarantee). The census
    * lowercases and splits on spaces.
    *
    * Shape at 100 TB: one narrow explode in the scan stage, then ONE
    * partial+final hash agg keyed by (dst_domain, term) — bounded by
    * the distinct census vocabulary, not the corpus; counts collapse
    * map-side. */
  def anchorTermCensus(links: DataFrame): DataFrame =
    links
      .withColumn("is_internal", col("src_domain") === col("dst_domain"))
      .select(col("doc_id"), col("dst_domain"), col("is_internal"),
        explode(org.apache.spark.sql.functions.filter(
          split(lower(col("anchor")), " "),
          t => length(t) > 0)).as("term"))
      .groupBy("dst_domain", "term")
      .agg(count(lit(1)).as("n_links"),
        sum(col("is_internal").cast("long")).as("n_internal"),
        count_distinct(col("doc_id")).as("n_src_docs"))

  // ----------------------------------------------- deterministic crawl gen

  /** Escape text for embedding in HTML (the writer half of the entity
    * round trip — only the three structurally dangerous characters). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Column twin of [[escape]] for XML/HTML WRITER sinks (sitemap
    * `<loc>` values et al.): `&` first — its replacement introduces no
    * `<`/`>`, and the later two produce no `&`, so the chain is one
    * effective pass. Plain `replace`, no regex engine in the render
    * path (the x86 lesson). */
  def escapeCol(c: Column): Column = {
    val amp = call_function("replace", c, lit("&"), lit("&amp;"))
    val lt = call_function("replace", amp, lit("<"), lit("&lt;"))
    call_function("replace", lt, lit(">"), lit("&gt;"))
  }

  /** Inverse of [[escapeCol]] for the PARSE half of the XML round
    * trip: `&lt;`/`&gt;` first and `&amp;` LAST — the order under
    * which `&amp;lt;` decodes to `&lt;` exactly once (`&lt;` never
    * occurs as a substring of `&amp;lt;`, and the first two
    * replacements emit no `&`, so nothing is re-scanned). Total
    * inverse on [[escapeCol]] output; on text that was never escaped
    * it is the identity whenever none of the three entities appear. */
  def unescapeXmlCol(c: Column): Column = {
    val lt = call_function("replace", c, lit("&lt;"), lit("<"))
    val gt = call_function("replace", lt, lit("&gt;"), lit(">"))
    call_function("replace", gt, lit("&amp;"), lit("&"))
  }

  /** Deterministic HTML page for a corpus document — every structural
    * hazard the extractor must survive, each in closed form so the
    * DuckDB oracle can rebuild the page (and the extraction) from the
    * documents table alone: a styled head, an inline script, a comment,
    * the escaped document text, a pre-escaped entity footer, and
    * `1 + doc_id % 5` nav links. */
  def pageFor(docId: Long, source: String, text: String): String = {
    val nLinks = (docId % 5).toInt + 1
    val nav = (0 until nLinks).map(i =>
      s"""<a href="/$source/${docId + i + 1}">ref-$i</a>""").mkString
    s"<html><head><title>Doc $docId - $source</title>" +
      "<style>p{margin:0}</style>" +
      s"<script>var id=$docId;</script></head>" +
      s"<body><h1>$source/$docId</h1><!-- crawler note -->" +
      s"<p>${escape(text)}</p>" +
      "<p>Tom &amp; Jerry &lt;3 &gt;&#33;</p>" +
      nav + "</body></html>"
  }

  private def two(n: Long): String = f"$n%02d"

  /** Deterministic WARC timestamp: 2024-01-01 plus `docId % 86400` s. */
  def dateFor(docId: Long): String = {
    val s = ((docId % 86400) + 86400) % 86400
    s"2024-01-01T${two(s / 3600)}:${two(s / 60 % 60)}:${two(s % 60)}Z"
  }

  def uriFor(docId: Long, source: String): String =
    s"https://crawl.example/$source/$docId"

  /** documents → single-record `.warc.gz` archives (media_id, archive
    * bytes): the real writer, the real gzip member layout, one archive
    * per document so the scan stays row-parallel in the query harness.
    * Multi-record member concatenation is exercised in WarcSpec. */
  def warcFromDocs(docs: DataFrame): DataFrame = {
    val enc = udf((docId: Long, source: String, text: String) =>
      Warc.gzipMembers(Seq(Warc.writeResponse(
        s"<urn:graft:$docId>", dateFor(docId), uriFor(docId, source),
        pageFor(docId, source, text).getBytes(UTF_8)))))
    docs.select(
      col("doc_id").as("media_id"),
      enc(col("doc_id"), col("source"), col("text")).as("content"))
  }

  /** documents → multi-record `.warc.gz` SEGMENT archives, the Common
    * Crawl layout proper: `doc_id % nSegments` docs per archive, records
    * in doc_id order, one gzip member per record. ONE exchange (the
    * segment groupBy); at corpus scale nSegments is the file-level
    * parallelism knob exactly as in the real dataset. */
  def warcSegmentsFromDocs(docs: DataFrame, nSegments: Int = 16): DataFrame = {
    require(nSegments > 0, s"nSegments must be positive: $nSegments")
    val seg = udf((rows: Seq[Row]) =>
      Warc.gzipMembers(rows.map { r =>
        val (id, src, txt) = (r.getLong(0), r.getString(1), r.getString(2))
        Warc.writeResponse(s"<urn:graft:$id>", dateFor(id), uriFor(id, src),
          pageFor(id, src, txt).getBytes(UTF_8))
      }))
    docs
      .groupBy((col("doc_id") % nSegments).as("segment"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("source"), col("text")))).as("recs"))
      .select(col("segment"), seg(col("recs")).as("content"))
  }

  /** Parse per-document archives into records keyed by `media_id`. */
  def parseDocArchives(archives: DataFrame): DataFrame = {
    val schema = StructType(StructField("media_id", LongType, nullable = false)
      +: Warc.recordSchema.fields.filterNot(_.name == "archive").toSeq)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    archives.select(col("media_id"), col("content")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        Warc.readAll(r.getAs[Array[Byte]](1)).iterator.map { w =>
          Row(id, w.recordType, w.recordId, w.warcDate, w.targetUri,
            w.contentLength, w.httpStatus, w.httpContentType, w.body)
        }
      }
    }(enc)
  }
}
