package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** POSIX ustar TAR ingest in the WebDataset convention — the shard
  * format large multimodal training sets actually ship in (LAION,
  * img2dataset output, every WebDataset loader): a `.tar` whose entries
  * are `<key>.<ext>` files, where all entries sharing a basename key
  * form ONE training sample (`0001.jpg` + `0001.txt` + `0001.json`).
  * The tar layer gives sequential-read locality; the key convention
  * gives the sample join for free, inside the archive, with no
  * shuffle.
  *
  * Format facts this reader follows (POSIX.1-1988 ustar):
  *  - 512-byte header blocks: name at 0 (100 bytes, NUL-padded), size
  *    at 124 (12 bytes, octal, NUL/space terminated), typeflag at 156
  *    ('0' or NUL = regular file), `ustar` magic at 257, checksum at
  *    148 (octal sum of the header with the checksum field read as
  *    spaces — verified, bad-checksum entries drop).
  *  - Entry data is NUL-padded to a 512 multiple; the archive ends with
  *    two zero blocks (or EOF — torn tails drop the torn entry only,
  *    the [[Warc]] discipline).
  *
  * Scale posture: one shard = one blob (`binaryFile`), entries and the
  * per-key sample grouping both resolve inside the task that read the
  * shard — the sample "join" never touches the shuffle system. Shards
  * are the unit of parallelism exactly as WebDataset prescribes.
  */
object Tar {

  final case class Entry(name: String, bytes: Array[Byte])

  // ---------------------------------------------------------------- write

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(UTF_8)
  }

  /** Serialize entries as a ustar archive (regular files, mode 0644,
    * epoch mtime for determinism, two zero blocks at the end). */
  def write(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, bytes) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes(UTF_8)
      require(nb.length <= 100, s"entry name too long: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy("0000644\u0000".getBytes(UTF_8), 0, h, 100, 8) // mode
      System.arraycopy(octal(0, 8), 0, h, 108, 8)                     // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8)                     // gid
      System.arraycopy(octal(bytes.length.toLong, 12), 0, h, 124, 12) // size
      System.arraycopy(octal(0, 12), 0, h, 136, 12)                   // mtime
      h(156) = '0'                                                    // typeflag
      System.arraycopy("ustar\u000000".getBytes(UTF_8), 0, h, 257, 8) // magic+ver
      // checksum: header summed with the checksum field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum
      System.arraycopy(octal(sum.toLong, 7), 0, h, 148, 7)
      h(155) = ' '
      out.write(h)
      out.write(bytes)
      val pad = (512 - bytes.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  // ----------------------------------------------------------------- read

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    val s = new String(b, off, len, UTF_8)
      .dropWhile(_ == ' ').takeWhile(c => c >= '0' && c <= '7')
    if (s.isEmpty) None
    else try Some(java.lang.Long.parseLong(s, 8))
    catch { case _: NumberFormatException => None }
  }

  private def checksumOk(h: Array[Byte]): Boolean =
    parseOctal(h, 148, 8).exists { stored =>
      val copy = h.clone()
      java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
      copy.map(_ & 0xff).sum.toLong == stored
    }

  /** NUL-terminated string field (the whole field when no NUL). */
  private def strField(h: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && h(end) != 0) end += 1
    new String(h, off, end - off, UTF_8)
  }

  /** `path` override from a PAX extended header (POSIX.1-2001): the
    * data block is a sequence of `"<len> <key>=<value>\n"` records,
    * `len` counting the WHOLE record in bytes including the length
    * digits, the space, and the newline; values are UTF-8. Returns the
    * last `path` value, None when absent or malformed (malformed pax
    * data degrades to no override, never a throw). */
  private def paxPath(data: Array[Byte]): Option[String] = {
    var pos = 0
    var found: Option[String] = None
    var ok = true
    while (ok && pos < data.length) {
      var sp = pos
      while (sp < data.length && data(sp) != ' '.toByte) sp += 1
      val len =
        if (sp >= data.length) -1
        else new String(data, pos, sp - pos, UTF_8).toIntOption.getOrElse(-1)
      if (len <= 0 || pos + len > data.length ||
        data(pos + len - 1) != '\n'.toByte) ok = false
      else {
        val rec = new String(data, sp + 1, pos + len - 1 - (sp + 1), UTF_8)
        val eq = rec.indexOf('=')
        if (eq > 0 && rec.substring(0, eq) == "path")
          found = Some(rec.substring(eq + 1))
        pos += len
      }
    }
    found
  }

  /** Parse every regular-file entry; stops cleanly at the zero-block
    * terminator; torn or checksum-bad tails drop the bad entry only.
    * Long paths from standard tools resolve all THREE ways they ship:
    * the ustar `prefix` field (offset 345, POSIX.1-1988 — joined as
    * `prefix/name`), GNU tar's 'L' long-name pseudo-entry (the data
    * block carries the NUL-terminated name of the NEXT entry), and a
    * PAX 'x' extended header's `path` record (POSIX.1-2001 — what
    * modern bsdtar and `tar --format=pax` emit; highest precedence,
    * per the pax spec). Global 'g' headers skip without consuming a
    * pending override. */
  def readAll(tar: Array[Byte]): Seq[Entry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    var done = false
    var pendingLongName: Option[String] = None
    var pendingPaxPath: Option[String] = None
    while (!done && pos + 512 <= tar.length) {
      val h = java.util.Arrays.copyOfRange(tar, pos, pos + 512)
      if (h.forall(_ == 0)) done = true // terminator
      else {
        val size = parseOctal(h, 124, 12)
        if (!checksumOk(h) || size.isEmpty ||
          pos + 512 + size.get > tar.length) done = true // torn/bad: stop
        else {
          val sz = size.get.toInt
          def data = java.util.Arrays.copyOfRange(tar, pos + 512, pos + 512 + sz)
          val tf = h(156)
          if (tf == 'L'.toByte) {
            // GNU long name: names the immediately following entry
            val raw = data
            val end = raw.indexOf(0.toByte) match {
              case -1 => raw.length; case i => i
            }
            pendingLongName = Some(new String(raw, 0, end, UTF_8))
          } else if (tf == 'x'.toByte) {
            // PAX per-file extended header: path= names the next entry
            paxPath(data).foreach(p => pendingPaxPath = Some(p))
          } else if (tf == 'g'.toByte) {
            // PAX global header: defaults only — skip, don't consume
          } else {
            // pending pax/'L' overrides belong to THIS entry whatever
            // its type — consume even when the entry is skipped below
            val name = pendingPaxPath.orElse(pendingLongName).getOrElse {
              val base = strField(h, 0, 100)
              // prefix only exists under the ustar magic (POSIX "ustar\0"
              // or GNU "ustar "); pre-ustar headers end at the name field
              val magic = new String(h, 257, 5, UTF_8)
              val prefix = if (magic == "ustar") strField(h, 345, 155) else ""
              if (prefix.nonEmpty) prefix + "/" + base else base
            }
            pendingLongName = None
            pendingPaxPath = None
            if (tf == '0'.toByte || tf == 0.toByte) out += Entry(name, data)
            // other non-regular entries (dirs, links) skip
          }
          pos += 512 + sz + (512 - sz % 512) % 512
        }
      }
    }
    out.toSeq
  }

  // -------------------------------------------------------- DataFrame API

  val entrySchema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** (archive, content) blobs → one row per regular entry; narrow. */
  def parseArchives(archives: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(entrySchema)
    archives.mapPartitions { it =>
      it.flatMap { r =>
        val name = if (r.isNullAt(0)) null else r.getString(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else readAll(bytes).iterator.map(e => Row(name, e.name, e.bytes))
      }
    }(enc)
  }

  /** documents → WebDataset shards: `doc_id % nShards` samples per
    * `.tar`, each sample a `<id>.txt` caption plus a `<id>.json`
    * metadata sidecar (the img2dataset layout with the image slot left
    * to the media tier), entries in id order. ONE exchange (the shard
    * groupBy) — the same segment discipline as the WARC writer. */
  /** Minimal JSON string escape (RFC 8259): backslash, quote, control
    * chars — a source/lang value containing a quote must not produce a
    * malformed sidecar. */
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def webdatasetFromDocs(docs: DataFrame, nShards: Int = 8): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    // rows arrive already doc_id-ordered: the aggregation below wraps
    // collect_list in sort_array on a struct led by doc_id
    val mk = udf((rows: Seq[Row]) =>
      write(rows.flatMap { r =>
        val id = r.getLong(0)
        val json = s"""{"doc_id":$id,"source":${jsonStr(r.getString(1))},""" +
          s""""lang":${jsonStr(r.getString(2))}}"""
        Seq(s"$id.txt" -> r.getString(3).getBytes(UTF_8),
          s"$id.json" -> json.getBytes(UTF_8))
      }))
    docs
      .groupBy((col("doc_id") % nShards).as("shard"))
      .agg(sort_array(collect_list(struct(
        col("doc_id"), col("source"), col("lang"), col("text")))).as("recs"))
      .select(col("shard"), mk(col("recs")).as("content"))
  }

  /** WebDataset sample grouping: key = basename before the first '.',
    * ext = the remainder; one output row per (archive, key) with an
    * ext→bytes map. The grouping happens PER ARCHIVE in one narrow
    * pass (entries of a sample are adjacent in a well-formed shard, and
    * always in the same archive) — no shuffle. */
  def webdatasetSamples(archives: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("archive", StringType, nullable = true),
      StructField("key", StringType, nullable = false),
      StructField("parts", MapType(StringType, BinaryType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    archives.mapPartitions { it =>
      it.flatMap { r =>
        val name = if (r.isNullAt(0)) null else r.getString(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else readAll(bytes)
          .map { e =>
            val dot = e.name.indexOf('.')
            if (dot < 0) (e.name, "", e.bytes)
            else (e.name.substring(0, dot), e.name.substring(dot + 1), e.bytes)
          }
          .groupBy(_._1).toSeq.sortBy(_._1)
          .iterator.map { case (key, parts) =>
            Row(name, key, parts.map(p => p._2 -> p._3).toMap)
          }
      }
    }(enc)
  }
}
