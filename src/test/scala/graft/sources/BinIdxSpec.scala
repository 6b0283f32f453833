package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class BinIdxSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("idx header bytes are byte-pinned: magic, version, dtype, " +
    "counts, sizes, byte pointers, doc ramp — all little-endian") {
    val idx = BinIdx.writeIdx(Array(3, 0, 2))
    // magic + version(1) + dtype(8=uint16)
    assert(idx.take(9).toSeq == "MMIDIDX".getBytes.toSeq ++ Seq(0, 0))
    assert(idx.slice(9, 17).toSeq ==
      Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(idx(17) == 8)
    assert(idx.slice(18, 26).toSeq == Seq[Byte](3, 0, 0, 0, 0, 0, 0, 0))
    assert(idx.slice(26, 34).toSeq == Seq[Byte](4, 0, 0, 0, 0, 0, 0, 0))
    // sizes i32: 3, 0, 2
    assert(idx.slice(34, 46).toSeq == Seq[Byte](3, 0, 0, 0, 0, 0, 0, 0,
      2, 0, 0, 0))
    // pointers i64 (BYTE offsets at 2 bytes/token): 0, 6, 6
    assert(idx.slice(46, 54).forall(_ == 0))
    assert(idx(54) == 6 && idx.slice(55, 62).forall(_ == 0))
    assert(idx(62) == 6 && idx.slice(63, 70).forall(_ == 0))
    // doc ramp 0..3 inclusive
    assert((0 to 3).forall(d => idx(70 + 8 * d) == d))
    assert(idx.length == 70 + 8 * 4)
  }

  test("write -> parse round-trips exactly, incl. empty sequences and " +
    "ids above 0x7FFF (uint16, not int16)") {
    val seqs = Seq(Array(1, 65535, 32768), Array.empty[Int], Array(7, 8))
    val got = BinIdx.parse(BinIdx.writeIdx(seqs.map(_.length).toArray),
      BinIdx.writeBin(seqs))
    assert(got.map(_.toSeq) == seqs.map(_.toSeq))
  }

  test("torn bin keeps the fitting prefix; junk and mangled headers " +
    "yield zero sequences, never throw") {
    val seqs = Seq(Array(1, 2, 3), Array(4, 5), Array(6))
    val idx = BinIdx.writeIdx(seqs.map(_.length).toArray)
    val bin = BinIdx.writeBin(seqs)
    // cut mid-second-sequence: only the first survives
    val torn = BinIdx.parse(idx, bin.take(8))
    assert(torn.map(_.toSeq) == Seq(Seq(1, 2, 3)))
    assert(BinIdx.parse("garbage".getBytes, bin).isEmpty)
    assert(BinIdx.parse(idx.take(20), bin).isEmpty)       // torn header
    val wrongVersion = idx.clone(); wrongVersion(9) = 2
    assert(BinIdx.parse(wrongVersion, bin).isEmpty)
    val floatDtype = idx.clone(); floatDtype(17) = 6      // float ids
    assert(BinIdx.parse(floatDtype, bin).isEmpty)
    val badCount = idx.clone(); badCount(18) = 99         // n_seqs lies
    assert(BinIdx.parse(badCount, bin).isEmpty)
  }

  test("probe tells 'unsupported_dtype' apart from 'junk': a valid " +
    "external Megatron file in a foreign dtype is reported, not " +
    "silently dropped") {
    val idx = BinIdx.writeIdx(Array(2, 1))
    assert(BinIdx.probe(idx) == "ok")
    val f = idx.clone(); f(17) = 6                        // float32
    assert(BinIdx.probe(f) == "unsupported_dtype")
    val i64 = idx.clone(); i64(17) = 5                    // int64
    assert(BinIdx.probe(i64) == "unsupported_dtype")
    assert(BinIdx.probe("garbage".getBytes) == "junk")
    assert(BinIdx.probe(idx.take(20)) == "junk")
    val badCount = idx.clone(); badCount(18) = 99
    assert(BinIdx.probe(badCount) == "junk")
  }

  test("external layouts parse: int32 dtype decodes (ids above 65535 " +
    "included) and a SHORT doc_idx (documents spanning sequences) is " +
    "accepted — its content is ignored anyway") {
    // int32 variant of the u16 writer: same header with dtype=4,
    // pointers at 4 bytes/token, ids straddling the u16 range
    val seqs = Seq(Array(1, 70000), Array(3))
    val out = new java.io.ByteArrayOutputStream()
    def u64(b: java.io.ByteArrayOutputStream, v: Long): Unit =
      (0 until 8).foreach(i => b.write(((v >>> (8 * i)) & 0xFF).toInt))
    def i32(b: java.io.ByteArrayOutputStream, v: Int): Unit =
      (0 until 4).foreach(i => b.write((v >>> (8 * i)) & 0xFF))
    out.write("MMIDIDX".getBytes); out.write(0); out.write(0)
    u64(out, 1L); out.write(4)                            // version, int32
    u64(out, 2L); u64(out, 2L)        // n_seqs=2, n_docs=2 (< n_seqs+1!)
    seqs.foreach(s => i32(out, s.length))                 // sizes
    u64(out, 0L); u64(out, 8L)                            // byte pointers
    u64(out, 0L); u64(out, 2L)                            // 2-entry doc_idx
    val bin = new java.io.ByteArrayOutputStream()
    seqs.flatten.foreach(i32(bin, _))
    val idxBytes = out.toByteArray
    val binBytes = bin.toByteArray
    assert(BinIdx.probe(idxBytes) == "ok")
    val got = BinIdx.parse(idxBytes, binBytes)
    assert(got.map(_.toSeq) == Seq(Seq(1, 70000), Seq(3)))
    // u16 files with doc_idx SHORTER than n_seqs+1 parse too
    val u16 = BinIdx.writeIdx(Array(2, 1))
    val shortDoc = u16.dropRight(8)                       // drop one ramp row
    val fix = shortDoc.clone(); fix(26) = 2               // n_docs = 2
    assert(BinIdx.parse(fix, BinIdx.writeBin(Seq(Array(9, 9), Array(7))))
      .map(_.toSeq) == Seq(Seq(9, 9), Seq(7)))
  }

  test("trained-vocab export: shardsFromIds + merges.txt sidecar -> " +
    "read -> decode(sidecar, .bin) round-trips CJK/emoji/code text") {
    import graft.functions.{ByteBpe, ByteBpeIds}
    val texts = Map(
      0L -> "the cat sat on the mat",
      3L -> "水水水 water it's 99",
      5L -> "x=42; a[i]*99 дd 😀!",
      8L -> "the the the")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val merges = graft.ext.TextOps
      .trainByteBpeMergesFast(docs, nMerges = 10).map(m => (m._1, m._2))
    // the sidecar travels through the PUBLISHED file format — what a
    // training job would read next to the .bin/.idx shards
    val sidecar = ByteBpe.parseGpt2Merges(ByteBpe.renderGpt2Merges(merges))
    assert(sidecar == merges, "sidecar did not round-trip the table")
    val ids = docs.select(col("doc_id"),
      ByteBpeIds(col("text"), merges).as("ids"))
    val rows = BinIdx.read(BinIdx.shardsFromIds(ids, nShards = 4))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Int](3))
      .toMap
    // layout: shard = doc_id % 4, pos = doc_id rank within shard
    val layout = Map((0L, 0) -> 0L, (0L, 1) -> 8L, (3L, 0) -> 3L,
      (1L, 0) -> 5L)
    assert(rows.keySet == layout.keySet)
    val vocab = ByteBpe.vocabOfMerges(sidecar)
    layout.foreach { case (k, docId) =>
      assert(ByteBpe.decodeIds(rows(k).toArray, vocab) == texts(docId),
        s"decode(sidecar, .bin) broke on doc $docId")
    }
    // ids above the vocab ceiling refuse at the writer (uint16 dtype)
    val bad = Seq((1L, Seq(70000))).toDF("doc_id", "ids")
    val ex = intercept[org.apache.spark.SparkException] {
      BinIdx.shardsFromIds(bad, nShards = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("packed-group export: the EOD separator (65535) sits AFTER EACH " +
    "member document, members in doc_id order — the position property " +
    "x175's order-free sum oracle cannot pin") {
    // the x175 grouping aggregate verbatim, on a hand-checked pack
    val members = Seq((5L, Seq(1, 2, 3)), (2L, Seq(7, 8)), (9L, Seq()))
      .toDF("doc_id", "ids")
    val got = members
      .groupBy()
      .agg(aggregate(
        sort_array(collect_list(struct(col("doc_id"), col("ids")))),
        array().cast("array<int>"),
        (acc, x) => concat(acc, x.getField("ids"),
          array(lit(65535)))).as("ids"))
      .head().getSeq[Int](0)
    assert(got == Seq(7, 8, 65535, 1, 2, 3, 65535, 65535),
      s"EOD placement/member order broke: $got")
  }

  test("shardsFromDocs -> read round-trips the distributed path: ids " +
    "are the x82 hashed-vocab kernel, order is doc_id rank per shard") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (3L, "jumps over"),
      (8L, "the lazy dog"),
      (5L, ""),                       // zero tokens: a size-0 sequence
      (11L, "single")).toDF("doc_id", "text")
    val rows = BinIdx.read(BinIdx.shardsFromDocs(docs, nShards = 4))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getSeq[Int](3))).toMap
    // shard layout: 0 -> [0, 8], 3 -> [3, 11], 1 -> [5]
    assert(rows.keySet == Set((0L, 0), (0L, 1), (3L, 0), (3L, 1), (1L, 0)))
    def ids(t: String) = BinIdx.tokenIds(t).toSeq
    assert(rows((0L, 0)) == ((4, ids("the quick brown fox"))))
    assert(rows((0L, 1)) == ((3, ids("the lazy dog"))))
    assert(rows((3L, 0)) == ((2, ids("jumps over"))))
    assert(rows((3L, 1)) == ((1, ids("single"))))
    assert(rows((1L, 0)) == ((0, Seq.empty[Int])))
    // hashed ids live in the uint16 vocab and equal tokens hash equal
    val all = rows.values.flatMap(_._2)
    assert(all.forall(v => v >= 0 && v < 65536))
    assert(ids("the a the").head == ids("the a the")(2))
  }
}
