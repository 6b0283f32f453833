package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenized-binary export in the MMIDIDX layout — the `.bin`/`.idx`
  * indexed-dataset family Megatron-LM-style training loaders consume:
  * the terminal format of a training-data pipeline, after cleaning,
  * dedup, selection, and tokenization have all run. A training job
  * never re-reads text; it memory-maps the token ids.
  *
  * Byte layout written and parsed here (all integers little-endian):
  *
  *   .idx: magic `MMIDIDX\0\0` (9 bytes) · version u64 = 1 ·
  *         dtype u8 (8 = uint16, 4 = int32 token ids — both parsed) ·
  *         n_seqs u64 · n_docs u64 ·
  *         sizes i32[n_seqs] (token count per sequence) ·
  *         pointers i64[n_seqs] (BYTE offset of each sequence in .bin) ·
  *         doc_idx i64[n_docs] (sequence index where each document
  *         starts, ending with the n_seqs sentinel — the identity ramp
  *         when one document is one sequence, as this writer emits;
  *         external files where documents span several sequences carry
  *         FEWER entries, so any `n_docs ≤ n_seqs + 1` is accepted and
  *         the doc_idx content, which this reader never consumes, is
  *         ignored)
  *   .bin: the token ids, uint16/int32 LE, sequences concatenated.
  *
  * Token ids here are the engine's hashed-vocabulary ids — the x59/x82
  * kernel `floorMod(mix64(fnv(token)), 65536)` via
  * [[graft.functions.ShingleHashes.shingleHashesAll]] at k = 1 — so the
  * whole write → read round trip is independently replayable by the
  * DuckDB oracle with no vocabulary artifact (swap in any real
  * tokenizer's ids and only the id column changes).
  *
  * Torn-tail discipline (the [[Warc]]/[[Tar]] convention): a truncated
  * `.bin` keeps every sequence whose slice still fits and drops the
  * torn tail; junk or a mangled `.idx` header yields zero sequences,
  * never an exception. "Unsupported layout" is NOT silently conflated
  * with junk: [[probe]] classifies a blob as `ok` / `unsupported_dtype`
  * / `junk`, so a valid external Megatron dataset in a dtype this
  * reader lacks is reported, not dropped.
  *
  * Scale posture: one shard = one (idx, bin) blob pair built inside its
  * own task from the shard's collected rows and parsed back inside the
  * task that read it — shards are the unit of parallelism, nothing
  * token-level ever rides an exchange.
  */
object BinIdx {

  private val Magic: Array[Byte] =
    Array('M', 'M', 'I', 'D', 'I', 'D', 'X', 0, 0).map(_.toByte)
  private val Version = 1L
  private val DtypeU16: Byte = 8
  private val DtypeI32: Byte = 4
  val VocabDim = 65536L

  /** Hard per-shard `.bin` ceiling: one shard renders in one JVM byte
    * array, so it can never exceed Int.MaxValue bytes — the builder
    * REFUSES (with the sizing rule in the message) rather than
    * overflowing. Sizing rule: pick `nShards ≥ ceil(2·Σ n_tokens /
    * 1 GiB)` so shards stay well under the ceiling AND small enough
    * that the per-task collect_list state (all of a shard's text)
    * fits executor memory — the shard is the unit of parallelism, so
    * more shards is also more parallelism, never a correctness risk. */
  val MaxShardBytes: Long = Int.MaxValue.toLong - 64L

  /** Hashed-vocabulary token ids for a text (the x82 kernel). */
  def tokenIds(text: String): Array[Int] =
    graft.functions.ShingleHashes.shingleHashesAll(text, 1)
      .map(h => java.lang.Math.floorMod(h, VocabDim).toInt)

  // --------------------------------------------------------------- write

  private def putU64(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { b.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def putI32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    var i = 0
    while (i < 4) { b.write((v >>> (8 * i)) & 0xFF); i += 1 }
  }

  /** Render the `.idx` bytes for the given per-sequence token counts. */
  def writeIdx(sizes: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, Magic.length)
    putU64(out, Version)
    out.write(DtypeU16.toInt)
    putU64(out, sizes.length.toLong)
    putU64(out, sizes.length.toLong + 1L)
    sizes.foreach(putI32(out, _))
    var off = 0L
    sizes.foreach { n => putU64(out, off); off += n.toLong * 2L }
    var d = 0L
    while (d <= sizes.length) { putU64(out, d); d += 1 }
    out.toByteArray
  }

  /** Render the `.bin` bytes: sequences concatenated, uint16 LE. */
  def writeBin(seqs: Seq[Array[Int]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    seqs.foreach(_.foreach { v =>
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    })
    out.toByteArray
  }

  /** Render one shard's (idx, bin) pair, enforcing [[MaxShardBytes]]
    * with the sizing rule spelled out — shared by every shard
    * builder. */
  private[sources] def buildShard(seqs: Seq[Array[Int]])
      : (Array[Byte], Array[Byte]) = {
    val total = seqs.iterator.map(_.length.toLong * 2L).sum
    require(total <= MaxShardBytes,
      s"shard .bin would be $total bytes (> $MaxShardBytes, the one-" +
        "JVM-array ceiling); raise nShards — sizing rule: nShards >= " +
        "ceil(2 * total corpus tokens / 1 GiB)")
    (writeIdx(seqs.map(_.length).toArray), writeBin(seqs))
  }

  // --------------------------------------------------------------- parse

  private def u64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(off + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  private def i32(b: Array[Byte], off: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v |= (b(off + i) & 0xFF) << (8 * i); i += 1 }
    v
  }

  /** Header sanity shared by [[probe]] and [[parse]]: Some((dtype,
    * nSeqs, nDocs)) when the magic/version/counts are structurally
    * sound (dtype NOT judged here), None for junk. */
  private def header(idx: Array[Byte]): Option[(Byte, Long, Long)] = {
    if (idx == null || idx.length < 34) return None
    if (!idx.take(9).sameElements(Magic)) return None
    if (u64(idx, 9) != Version) return None
    val nSeqs = u64(idx, 18)
    val nDocs = u64(idx, 26)
    // sizes alone need 4 bytes/seq — bounds nSeqs before any Long math
    // can overflow, and rejects garbage counts from a mangled header.
    // doc_idx may be SHORTER than nSeqs+1 (external files where a
    // document spans several sequences), never longer.
    if (nSeqs < 0 || nSeqs > idx.length.toLong / 4) return None
    if (nDocs < 0 || nDocs > nSeqs + 1) return None
    val need = 34L + nSeqs * 4 + nSeqs * 8 + nDocs * 8
    if (need > idx.length.toLong) return None
    Some((idx(17), nSeqs, nDocs))
  }

  /** Classify an `.idx` blob: `"ok"` (this reader decodes it),
    * `"unsupported_dtype"` (a structurally valid MMIDIDX file whose
    * token width this reader lacks — uint8/int64/float…; the caller
    * should surface it, not treat it as garbage), or `"junk"`. */
  def probe(idx: Array[Byte]): String = header(idx) match {
    case None => "junk"
    case Some((dt, _, _)) if dt == DtypeU16 || dt == DtypeI32 => "ok"
    case _ => "unsupported_dtype"
  }

  /** Parse one shard: per-sequence token-id arrays in file order.
    * Junk / bad header / impossible counts / unsupported dtype → Nil
    * (use [[probe]] to tell the last case apart); a torn `.bin` keeps
    * the sequences whose slices still fit. uint16 and int32 ids both
    * decode. */
  def parse(idx: Array[Byte], bin: Array[Byte]): Seq[Array[Int]] = {
    if (bin == null) return Nil
    val (nSeqs, w) = header(idx) match {
      case Some((DtypeU16, s, _)) => (s, 2)
      case Some((DtypeI32, s, _)) => (s, 4)
      case _ => return Nil
    }
    val n = nSeqs.toInt
    val out = Seq.newBuilder[Array[Int]]
    var s = 0
    while (s < n) {
      val size = i32(idx, 34 + 4 * s)
      val ptr = u64(idx, 34 + 4 * n + 8 * s)
      if (size < 0 || ptr < 0 || ptr + size.toLong * w > bin.length.toLong)
        return out.result() // torn bin: keep the fitting prefix
      val ids = new Array[Int](size)
      var i = 0
      while (i < size) {
        val o = (ptr + w.toLong * i).toInt
        ids(i) =
          if (w == 2) (bin(o) & 0xFF) | ((bin(o + 1) & 0xFF) << 8)
          else i32(bin, o)
        i += 1
      }
      out += ids
      s += 1
    }
    out.result()
  }

  // --------------------------------------------------------- DataFrame IO

  /** Build (shard, idx, bin) blobs from a documents table: one sequence
    * per document, documents in doc_id order within their shard
    * (`doc_id % nShards`) — the deterministic layout the oracle
    * re-derives with a window rank. */
  def shardsFromDocs(docs: DataFrame, nShards: Int = 8,
                     textCol: String = "text"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val mk = udf((rows: Seq[Row]) => {
      buildShard(rows.map(r => tokenIds(r.getString(1))))
    })
    docs
      .groupBy(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col(textCol))))
        .as("recs"))
      .select(col("shard"), mk(col("recs")).as("c"))
      .select(col("shard"), col("c._1").as("idx"), col("c._2").as("bin"))
  }

  /** [[shardsFromDocs]] with CALLER-SUPPLIED token ids — the trained-
    * tokenizer export path: `docs` carries `(doc_id, idsCol:
    * array<int>)` where ids came from a real tokenizer (e.g.
    * [[graft.functions.ByteBpeIds]] under a trained byte-BPE table),
    * and the binary artifact pairs with that tokenizer's vocab/merges
    * sidecar. Same deterministic shard/rank layout, same per-shard
    * [[MaxShardBytes]] guard; ids must fit uint16 (a trained vocab of
    * ≤ 65 536 entries — the dtype this writer emits). */
  def shardsFromIds(docs: DataFrame, nShards: Int = 8,
                    idsCol: String = "ids"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val mk = udf((rows: Seq[Row]) => {
      val seqs = rows.map { r =>
        val ids = r.getSeq[Int](1).toArray
        ids.foreach(v => require(v >= 0 && v < VocabDim,
          s"token id $v outside the uint16 vocab [0, $VocabDim)"))
        ids
      }
      buildShard(seqs)
    })
    docs
      .groupBy(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col(idsCol))))
        .as("recs"))
      .select(col("shard"), mk(col("recs")).as("c"))
      .select(col("shard"), col("c._1").as("idx"), col("c._2").as("bin"))
  }

  /** Parse (shard, idx, bin) blobs back to one row per sequence:
    * `(shard, pos, n_tokens, ids)` — pos is the sequence's 0-based
    * index within its shard. Runs inside the task that holds the blob
    * (mapPartitions), nothing token-level shuffles. */
  def read(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("ids", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    shards.select(col("shard").cast("long"), col("idx"), col("bin"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val shard = r.getLong(0)
          parse(r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))
            .zipWithIndex.map { case (ids, pos) =>
              Row(shard, pos, ids.length, ids.toSeq)
            }
        }
      }(enc)
  }
}
