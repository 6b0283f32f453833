package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication over a `documents(doc_id, text,
  * …)` table. Four tiers, cheapest first:
  *
  *  1. exact      — content-hash groupBy (one shuffle on the hash key)
  *  2. minhash    — MinHash + LSH banding: near-dup candidates via an
  *                  equi-join on band buckets, never an O(n²) cross join
  *  3. simhash    — 64-bit weighted fingerprint, hamming-distance candidates
  *                  via block keys
  *  4. jaccard    — exact n-gram Jaccard verification on candidate pairs
  *
  * All shuffle keys are content-derived (hash/band/block), so the plan
  * scales horizontally: at 100 TB each stage is a hash-partitioned
  * shuffle-join on bounded-cardinality keys. No collect(), no cartesian.
  */
object Dedup {

  /** Word shingles (k-grams of tokens) as the document's feature set. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(lower(text), "\\s+")
    // sliding k-grams: transform over token index
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => when(i + k <= size(toks),
          concat_ws(" ", slice(toks, i + 1, lit(k))))),
      x => x.isNotNull))
  }

  /** 1. Exact dedup: md5 of normalized text → group; keeps the smallest
    * doc_id as the canonical representative. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Base token-hash array: distinct 64-bit shingle hashes, computed in one
    * native pass (graft.functions.ShingleHashes — tokenizer + k-gram +
    * hash + dedupe in a single expression; the declarative
    * split/transform/distinct/xxhash chain's interpreted lambdas dominated
    * the dedup bench). Per-seed hash families derive from these inside
    * MinHashSignature/SimHash64. */
  def tokenHashes(text: Column, shingleK: Int): Column =
    graft.functions.ShingleHashes(text, shingleK)

  /** 2. MinHash signature via the native expression — one row per doc, no
    * explode, no shuffle, whole-stage codegen. */
  def minhashSignature(docs: DataFrame, textCol: String = "text",
                       numHashes: Int = 16, shingleK: Int = 3): DataFrame =
    docs.withColumn("minhash",
      graft.functions.HashExprs.min_hash(
        tokenHashes(col(textCol), shingleK), numHashes))

  /** LSH band key: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Docs sharing ANY band bucket are candidates.
    * A pair colliding in several bands is deduplicated by grouping on the
    * two long ids — NOT by distinct over the signature arrays, whose
    * array-comparison shuffle benched ~4× slower. */
  def lshCandidates(withSig: DataFrame, bands: Int = 4,
                    rowsPerBand: Int = 4): DataFrame = {
    val banded = withSig.select(
      col("doc_id"), col("minhash"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at(col("minhash"), b * rowsPerBand + r + 1)): _*), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("doc_id").as("doc_a"), col("band"), col("bucket"),
                          col("minhash").as("sig_a"))
    val b = banded.select(col("doc_id").as("doc_b"), col("band"), col("bucket"),
                          col("minhash").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard",
        minhashJaccard(col("sig_a"), col("sig_b"), bands * rowsPerBand))
      .groupBy("doc_a", "doc_b")
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** Estimated Jaccard from signature agreement. */
  def minhashJaccard(sigA: Column, sigB: Column, numHashes: Int = 16): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / numHashes

  /** 2. full MinHash near-dup pipeline → candidate pairs with estimated
    * similarity ≥ threshold. */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.5,
                      numHashes: Int = 16, bands: Int = 4,
                      shingleK: Int = 3): DataFrame = {
    val sig = minhashSignature(docs, "text", numHashes, shingleK)
    lshCandidates(sig, bands, numHashes / bands)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** 3. SimHash: 64-bit fingerprint — per bit, sum +1/-1 votes of each
    * shingle's hash bit, weighted by nothing (uniform). Pure array algebra,
    * one row per doc. */
  def simhash(docs: DataFrame, textCol: String = "text",
              shingleK: Int = 2): DataFrame =
    docs.withColumn("simhash",
      graft.functions.HashExprs.sim_hash(tokenHashes(col(textCol), shingleK)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 3. SimHash near-dups: block on 16-bit quarters (a pair within hamming
    * distance 3 of 64 bits must agree on ≥1 of 4 quarters — pigeonhole), then
    * verify exact hamming ≤ maxDist. Equi-join on block key: scale-safe. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3,
                      shingleK: Int = 2): DataFrame = {
    val fp = simhash(docs, "text", shingleK)
    val blocked = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("quarter", "block")))
    val a = blocked.select(col("doc_id").as("doc_a"), col("quarter"),
                           col("block"), col("simhash").as("fp_a"))
    val b = blocked.select(col("doc_id").as("doc_b"), col("quarter"),
                           col("block"), col("simhash").as("fp_b"))
    a.join(b, Seq("quarter", "block"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              hamming(col("fp_a"), col("fp_b")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** 4. Exact n-gram Jaccard for pairs sharing ≥1 shingle, via the
    * postings-list pattern: group docs by shingle hash (ONE big shuffle),
    * emit the pair combinations of each posting map-side, count per pair,
    * then |A∪B| = |A|+|B|−|A∩B| with the sizes dimension broadcast.
    * The join key is the 64-bit shingle hash, not the string — cheaper
    * shuffle, collision odds ~n²·k/2⁶⁴. The previous self-join formulation
    * shuffled the exploded table twice and benched ~4× slower. */
  def jaccardPairs(docs: DataFrame, shingleK: Int = 3,
                   minJaccard: Double = 0.8): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(tokenHashes(col("text"), shingleK)).as("shingle"))
    // set sizes straight from the (distinct) shingle array — no shuffle
    val sizes = docs.select(col("doc_id"),
      size(tokenHashes(col("text"), shingleK)).cast("long").as("n_sh"))
    // postings list per shingle → all (a<b) pairs, generated map-side
    val postings = sh.groupBy("shingle")
      .agg(sort_array(collect_list("doc_id")).as("docs"))
      .filter(size(col("docs")) > 1)
    val pairs = postings.select(explode(
      flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))),
          b => struct(a.as("doc_a"), b.as("doc_b"))))))
      .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    val inter = pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("size_a"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("size_b"))), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
