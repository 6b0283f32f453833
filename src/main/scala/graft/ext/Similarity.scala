package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single scan with a codegen'd
  * zip_with/aggregate dot product against a literal query vector, then a
  * top-k. At 100 TB the scale path is LSH bucketing (random-hyperplane
  * signs): each vector maps to a small bucket key; a query probes only its
  * bucket (plus neighbors), turning the scan into a partition-pruned lookup.
  */
object Similarity {

  /** Dot product of an array column with a literal query vector, via the
    * native codegen'd [[graft.functions.DotFold]] — a sequential left fold
    * in element order (no UDF, no deserialization, no per-element closure).
    * Deliberately NOT an unrolled `+` chain: Catalyst's
    * ReorderAssociativeOperator may re-associate a flat Add chain, which
    * perturbs the low bits vs. a sequential fold — DotFold keeps
    * evaluation order fixed and oracle-exact (VectorExprsSpec pins it
    * bit-identical to the declarative aggregate/zip_with chain it
    * replaced). */
  def dotLiteral(vec: Column, q: Array[Double]): Column =
    graft.functions.VectorExprs.dot_fold(vec, array(q.map(lit): _*))

  /** L2 norm of an array column — sqrt of the self-dot fold. */
  def norm(vec: Column): Column =
    sqrt(graft.functions.VectorExprs.dot_fold(vec, vec))

  /** Cosine similarity against a literal query vector. */
  def cosineLiteral(vec: Column, q: Array[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    dotLiteral(vec, q) / (norm(vec) * lit(qn))
  }

  /** Cosine similarity between two array columns. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot_fold(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k by cosine against a literal query. Deterministic
    * tiebreak on id. orderBy+limit compiles to TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver, no full sort. */
  def topKCosine(embeddings: DataFrame, q: Array[Double], k: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol), cosineLiteral(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)

  /** Random-hyperplane LSH bucket key: sign bits of dot products with
    * `nPlanes` deterministic pseudo-random planes (seeded, reproducible
    * across runs and cluster sizes). */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 8,
                seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dotLiteral(vec, p) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH: assign each vector a bucket; answer a query by scanning
    * only its bucket. `probes` extra buckets (hamming-1 neighbors) trade
    * recall for work. Returns top-k within the probed buckets. */
  def annLsh(embeddings: DataFrame, q: Array[Double], k: Int, dim: Int,
             nPlanes: Int = 8, probes: Int = 0,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(q).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    val buckets = qBucket +: (0 until (if (probes > 0) nPlanes else 0))
      .take(probes).map(i => qBucket ^ (1L << i))
    embeddings
      .withColumn("bucket", lshBucket(col(vecCol), dim, nPlanes))
      .filter(col("bucket").isin(buckets: _*))
      .select(col(idCol), cosineLiteral(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the standard two-level index: a coarse
    * quantizer assigns every vector to its nearest centroid (the inverted
    * lists); a query probes only the `nProbe` lists whose centroids are
    * closest to it, then exact-re-ranks inside them.
    *
    * The coarse centroids here are the first `nCentroids` vectors by id —
    * deterministic and engine-independent, so the whole index is
    * oracle-checkable; production swaps in k-means centroids without
    * changing the plan shape. Scale shape: centroids broadcast (tiny), the
    * n×k assignment scores reduce map-side into a per-vector argmax (one
    * hash aggregation — the only shuffle), probing is a broadcast
    * semi-join, and the re-rank is TakeOrderedAndProject. At 100 TB the
    * inverted lists become the partitioning key, so a query touches
    * nProbe/nCentroids of the data. */
  def annIvf(embeddings: DataFrame, q: Array[Double], k: Int,
             nCentroids: Int = 16, nProbe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = embeddings.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    ivfQuery(embeddings, cent, q, k, nProbe, idCol, vecCol)
  }

  /** IVF query against an explicit centroid table `(cid, cvec)` — shared
    * by the deterministic first-k index (oracle-checked) and the k-means-
    * trained one. */
  def ivfQuery(embeddings: DataFrame, cent: DataFrame, q: Array[Double],
               k: Int, nProbe: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // assignment: argmax cosine over the broadcast centroid set; struct
    // max = (cos, cid) lexicographic, so ties break to the higher cid
    val assigned = embeddings
      .join(broadcast(cent))
      .withColumn("cc", cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(max(struct(col("cc"), col("cid"))).as("best"),
           first(col(vecCol)).as(vecCol))
      .select(col(idCol), col("best.cid").as("cid"), col(vecCol))
    val probes = cent
      .withColumn("qc", cosineLiteral(col("cvec"), q))
      .orderBy(desc("qc"), col("cid")).limit(nProbe)
      .select("cid")
    assigned.join(broadcast(probes), "cid")
      .select(col(idCol), cosineLiteral(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Lloyd-refined IVF centroids, seeded from the deterministic first-k
    * set. Each iteration is two DataFrame aggregations:
    *
    *   1. assignment — argmax cosine against the BROADCAST centroids (one
    *      hash-agg shuffle keyed on vector id);
    *   2. new means — posexplode to (cid, pos, component) and hash-agg
    *      sum/count. Partial aggregation combines map-side, so the shuffle
    *      carries only nCentroids × dim × nPartitions rows however big the
    *      corpus is.
    *
    * Only the k × dim centroid matrix ever reaches the driver (per
    * iteration, to rebroadcast). Empty clusters keep their previous
    * centroid. Deterministic: seed, assignment tiebreak (higher cid), and
    * decimal-routed means are all order-independent. */
  def trainIvfCentroids(embeddings: DataFrame, nCentroids: Int = 16,
                        iters: Int = 3,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = embeddings
      .filter(col(idCol) < nCentroids).orderBy(idCol).select(vecCol)
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    val dim = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val centDf = cents.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("cid", "cvec")
      val assigned = embeddings
        .join(broadcast(centDf))
        .withColumn("cc", cosine(col(vecCol), col("cvec")))
        .groupBy(col(idCol))
        .agg(max(struct(col("cc"), col("cid"))).as("best"),
             first(col(vecCol)).as(vecCol))
        .select(col("best.cid").as("cid"), col(vecCol))
      // decimal-routed sum: component means independent of partition order
      val parts = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(graft.ops.Stable.sumD(col("v").cast("double")).as("s"),
             count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      parts.groupBy(_.getLong(0)).foreach { case (cid, rows) =>
        val mean = new Array[Double](dim)
        rows.foreach { r =>
          mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
        }
        next(cid.toInt) = mean
      }
      cents = next
    }
    cents
  }

  /** IVF with k-means-trained centroids: train, then query — the
    * production path; the deterministic first-k variant stays for the
    * oracle. */
  def annIvfTrained(embeddings: DataFrame, q: Array[Double], k: Int,
                    nCentroids: Int = 16, nProbe: Int = 2, iters: Int = 3,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = trainIvfCentroids(embeddings, nCentroids, iters, idCol, vecCol)
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("cid", "cvec")
    ivfQuery(embeddings, centDf, q, k, nProbe, idCol, vecCol)
  }

  /** IVF-style per-label top-k: nearest neighbors within each coarse
    * partition (label = cluster id), e.g. for per-cluster diversity
    * sampling. Window rank — one shuffle on label. */
  def topKPerLabel(embeddings: DataFrame, q: Array[Double], k: Int,
                   labelCol: String = "label", idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col(labelCol))
      .orderBy(desc("cos"), col(idCol))
    embeddings
      .select(col(labelCol), col(idCol),
              cosineLiteral(col(vecCol), q).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** All-pairs near-duplicate detection by embedding cosine within LSH
    * buckets (the embedding-space analogue of Dedup.minhashNearDups). */
  def cosineNearDups(embeddings: DataFrame, dim: Int, minCos: Double = 0.95,
                     nPlanes: Int = 8,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val withBucket = embeddings
      .withColumn("bucket", lshBucket(col(vecCol), dim, nPlanes))
    val a = withBucket.select(col(idCol).as("id_a"), col("bucket"),
                              col(vecCol).as("vec_a"))
    val b = withBucket.select(col(idCol).as("id_b"), col("bucket"),
                              col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * space, compare pairs ONLY within a cluster, and keep one
    * representative per within-cluster similarity group. The clustering
    * is what makes semantic dedup tractable — candidate pairs fall from
    * O(n²) to Σ|cluster|², and each cluster's pair generation is an
    * equi-join on the cluster id.
    *
    * Stages (all shapes already oracle-proven elsewhere):
    *  1. deterministic coarse centroids (first-k, as [[annIvf]]) broadcast
    *     to an argmax-cosine assignment — one hash-agg shuffle;
    *  2. within-cluster pair generation via a cid equi-join self-join,
    *     exact pairwise cosine ≥ `minCos` → similarity edges;
    *  3. duplicate groups completed with
    *     [[Dedup.connectedComponents]] (a similarity edge is not
    *     transitive; the paper's per-cluster "keep one" needs the
    *     component, not the pair) — min-id representative;
    *  4. kept corpus = assignment anti-joined against the non-
    *     representative members.
    *
    * Returns (idCol, cid) of KEPT vectors. For production k-means
    * centroids, pass the [[trainIvfCentroids]] output through the same
    * pipeline; the deterministic variant is the oracle-checkable one.
    *
    * 100 TB posture: centroids broadcast (k×dim doubles); the corpus
    * shuffles once for assignment and once per self-join side on cid;
    * cluster sizes bound the quadratic term (pick nClusters ~ n/expected
    * cluster size; the paper uses 50k clusters for 8B embeddings). The
    * component step runs on the edge set only — corpus-independent. */
  def semDeDup(embeddings: DataFrame, nClusters: Int = 16,
               minCos: Double = 0.3,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val cent = embeddings.filter(col(idCol) < nClusters)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val assigned = embeddings
      .join(broadcast(cent))
      .withColumn("cc", cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(max(struct(col("cc"), col("cid"))).as("best"),
           first(col(vecCol)).as(vecCol))
      .select(col(idCol), col("best.cid").as("cid"), col(vecCol))
    val a = assigned.select(col("cid"), col(idCol).as("id_a"),
                            col(vecCol).as("vec_a"))
    val b = assigned.select(col("cid"), col(idCol).as("id_b"),
                            col(vecCol).as("vec_b"))
    val edges = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("vec_a"), col("vec_b")) >= minCos)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val drop = Dedup.connectedComponents(edges)
      .where(col("rep_id") =!= col("doc_id"))
      .select(col("doc_id").as(idCol))
    assigned.select(col(idCol), col("cid"))
      .join(drop, Seq(idCol), "left_anti")
  }

  /** Feature-hashed document embeddings — the engine's own text→vector
    * path (hashing trick / random-feature TF vectors), so the
    * similarity family (ANN, SemDeDup, embedding near-dup) can run on
    * corpora that arrive WITHOUT precomputed embeddings: token t lands
    * in dimension `floorMod(mix64(fnv(t)), dim)` (the repo's one hash
    * family, native codegen'd [[graft.functions.ShingleHashesAll]] at
    * k=1), counts accumulate per (doc, dim), and the vector is
    * L2-normalized. Emitted SPARSE as (doc_id, dim, w) rows — the dense
    * collect is one `groupBy(doc).pivot`-free array_sort away, but
    * sparse is what the bucketed joins consume. Every arithmetic step is
    * exact (integer counts, Σc² integer, one correctly-rounded sqrt and
    * one IEEE division per row), so the oracle replays it bit-exactly.
    *
    * Shape at 100 TB: the (doc, dim) count aggregates with map-side
    * partials (bounded by doc×min(tokens, dim) rows); the norm is a
    * per-doc window over ≤dim rows. Two content-keyed exchanges, no
    * vocabulary state. */
  def hashEmbed(docs: DataFrame, dim: Int = 64,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(dim > 0, s"embedding dim must be positive: $dim")
    val th = docs.select(col(idCol),
      explode(graft.functions.ShingleHashesAll(col(textCol), 1)).as("h"))
    val cnt = th
      .groupBy(col(idCol), pmod(col("h"), lit(dim.toLong)).as("dim"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(idCol))
    cnt
      .withColumn("ss", sum(col("c") * col("c")).over(w))
      .select(col(idCol), col("dim"),
        (col("c").cast("double") / sqrt(col("ss").cast("double"))).as("w"))
  }

  /** Top-k retrieval over the [[hashEmbed]] vectors for a free-text
    * query — the composition that makes the hashed embeddings USEFUL
    * without precomputed vectors: the query hashes driver-side through
    * the same kernel into a ≤dim-entry literal weight map that rides
    * into the scan (no join for the query side), each doc's cosine is
    * the sparse dot product of its rows against the map, folded in dim
    * order so the double sum is bit-exact across partitionings (the
    * DotFold discipline), and the cut is a TakeOrderedAndProject on the
    * (score DESC, doc_id) total order. Both vectors are unit-L2, so the
    * dot IS the cosine. */
  def hashAnnTopK(docs: DataFrame, queryText: String, k: Int = 10,
                  dim: Int = 64, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val qw = queryWeights(queryText, dim)
    require(qw.nonEmpty, "query text has no tokens")
    val emb = hashEmbed(docs, dim, textCol, idCol)
    val qCol = coalesce(element_at(typedLit(qw), col("dim")), lit(0.0))
    emb
      .withColumn("p", col("w") * qCol)
      .filter(col("p") =!= 0.0) // dims the query does not touch
      .groupBy(col(idCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("dim"), col("p")))),
        lit(0.0), (acc, x) => acc + x.getField("p")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side replay of the [[hashEmbed]] kernel for a query string:
    * dim → L2-normalized weight (exact integer counts, one sqrt). */
  def queryWeights(queryText: String, dim: Int): Map[Long, Double] = {
    val qh = graft.functions.ShingleHashes.shingleHashesAll(queryText, 1)
    val qcnt = qh.groupBy(h => java.lang.Math.floorMod(h, dim.toLong))
      .view.mapValues(_.length.toLong).toMap
    val qnorm = math.sqrt(qcnt.values.map(c => c * c).sum.toDouble)
    qcnt.map { case (d, c) => d -> c.toDouble / qnorm }
  }
}
