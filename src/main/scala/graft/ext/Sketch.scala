package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RELATIONAL probabilistic sketches — the remaining two of the three
  * classics a 100 TB ingest runs continuously, next to the relational
  * HyperLogLog ([[TextOps.hllVocabEstimate]], x217): the BLOOM FILTER
  * (Bloom 1970, CACM 13(7): approximate set MEMBERSHIP — "have I seen
  * this k-gram window in the benchmark set?" without materializing the
  * join) and the COUNT-MIN sketch (Cormode & Muthukrishnan 2005,
  * J. Algorithms 55: approximate FREQUENCY — term counts in d·w cells
  * regardless of vocabulary size). Both follow the x217 design rule:
  * the sketch state lives as ROWS of a DataFrame (words / registers),
  * built by ordinary aggregations, so the DuckDB oracle can rebuild and
  * inspect the state itself — nothing about the sketch is a trusted
  * black box — and both ship next to the EXACT statistic so every
  * report prices its own error (Bloom's false positives, CMS's
  * overestimates are one-sided by construction; the specs assert the
  * side).
  *
  * HASH FAMILY: seed i of a 64-bit key is `splitmix64(key + GOLDEN·i)`
  * — the [[graft.functions.HashExprs]] MinHash seed family, evaluated
  * by the codegen'd `Mix64Add` expression (Java wrap-around add; ANSI
  * overflow rules never see it) and replayed in the oracle through the
  * established HUGEINT mulmod chains.
  *
  * SHAPE AT 100 TB: the Bloom word table is m/32 rows and the CMS
  * register table d·w rows — both INDEPENDENT of corpus size, built by
  * one map-side-combined aggregation each, and small enough to
  * broadcast into the probe/estimate joins (the relational twin of
  * holding the bit array in executor memory, which a production gate
  * would do via a literal; the relational form is what makes the state
  * oracle-inspectable). Probing is stateless scan algebra + one
  * broadcast equi-join — stream-legal at the ingest door. */
object Sketch {

  private val Golden = graft.functions.HashExprs.GOLDEN

  /** Seed-i hash of a 64-bit key: `splitmix64(key + GOLDEN·(i+1))`,
    * the MinHash seed family (i = 0 is NOT the identity — probe
    * positions must not be the raw key, whose low bits carry the
    * upstream hash's structure). */
  private def seedHash(key: Column, i: Int): Column =
    graft.functions.HashExprs.mix64_add_col(key, Golden * (i + 1))

  /** The k probe positions of a key in an m-bit filter (array col). */
  private def positions(key: Column, mBits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(seedHash(key, i), lit(mBits.toLong))): _*)

  private def wordIdx: Column = expr("pos DIV 32")
  /** Bit mask within a 32-bit word (stored in a BIGINT so the oracle's
    * shift arithmetic never touches the sign bit). */
  private def bitMask: Column =
    expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")

  /** Build the Bloom word table over DISTINCT keys: `(wi, w)` rows
    * where bit j of word wi is bit (wi·32 + j) of the filter. One
    * aggregation; `bit_or` partials combine map-side; the table is
    * exactly ceil(m/32) rows however large the key set. */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int,
                 k: Int): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32: $mBits")
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16 hashes: $k")
    keys.select(col(keyCol).as("key")).distinct()
      .select(explode(positions(col("key"), mBits, k)).as("pos"))
      .select(wordIdx.as("wi"), bitMask.as("mask"))
      .groupBy("wi").agg(expr("bit_or(mask)").as("w"))
  }

  /** Probe the filter: for each input row's key, `maybe` = all k bits
    * set (the one-sided verdict: a stored key is ALWAYS maybe=true;
    * maybe=true for an unstored key is a false positive, priced by the
    * caller against the exact join). `keep` columns ride through. The
    * word table broadcasts; the whole probe is stateless — the
    * stream-legal membership gate shape. */
  def bloomProbe(probes: DataFrame, words: DataFrame, keyCol: String,
                 mBits: Int, k: Int,
                 keep: Seq[String] = Nil): DataFrame =
    bloomProbeBits(probes, words, keyCol, mBits, k, keep)
      .groupBy(keep.map(col) :+ col("key"): _*)
      .agg(expr("bool_and(bit)").as("maybe"))

  /** The PRE-AGGREGATION probe rows — one per (key, seed): `bit` =
    * that seed's filter bit is set. [[bloomProbe]] folds them with a
    * per-key bool_and; a STREAMING caller that must also roll up per
    * document folds the conjunction into its own single aggregation
    * instead (two chained groupBys are stream-illegal — the
    * [[graft.streaming.StreamingOps.streamingBloomGate]] shape).
    * Everything here is stateless: scan algebra + one broadcast
    * equi-join. A NULL key (an `explode_outer` placeholder for a doc
    * with no windows) yields k rows with `bit = false`. */
  def bloomProbeBits(probes: DataFrame, words: DataFrame,
                     keyCol: String, mBits: Int, k: Int,
                     keep: Seq[String] = Nil): DataFrame = {
    val kc = keep.map(col)
    probes
      .select(kc ++ Seq(col(keyCol).as("key"),
        explode(positions(col(keyCol), mBits, k)).as("pos")): _*)
      .select(kc ++ Seq(col("key"), wordIdx.as("wi"),
        bitMask.as("mask")): _*)
      .join(broadcast(words), Seq("wi"), "left")
      .withColumn("bit",
        col("w").isNotNull &&
          col("w").bitwiseAND(col("mask")) === col("mask"))
      .select(kc ++ Seq(col("key"), col("bit")): _*)
  }

  /** Build the Count-Min register table over key OCCURRENCES (one
    * input row per occurrence — multiplicity is the signal): `(j, b,
    * c)` rows, depth d rows of width w. One aggregation, d·w cells
    * max, count partials combine map-side — term frequency at scan
    * speed with state independent of vocabulary size. */
  def countMinRegisters(keys: DataFrame, keyCol: String, width: Int,
                        depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1 && depth <= 8,
      s"need width >= 2, 1 <= depth <= 8: $width/$depth")
    keys.select(posexplode(array((0 until depth).map(j =>
        pmod(seedHash(col(keyCol), j), lit(width.toLong))): _*))
        .as(Seq("j", "b")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
  }

  /** Point-estimate each query key: `c_est` = min over the d rows of
    * the key's register (the CMS guarantee: `c_est ≥ c_true` always;
    * the overestimate is bounded by the colliding mass). `keep`
    * columns ride through; the register table broadcasts. */
  def countMinEstimate(queries: DataFrame, registers: DataFrame,
                       keyCol: String, width: Int, depth: Int,
                       keep: Seq[String] = Nil): DataFrame = {
    val kc = keep.map(col)
    queries
      .select(kc ++ Seq(col(keyCol).as("key"),
        posexplode(array((0 until depth).map(j =>
          pmod(seedHash(col(keyCol), j), lit(width.toLong))): _*))
          .as(Seq("j", "b"))): _*)
      .join(broadcast(registers), Seq("j", "b"), "left")
      .groupBy(kc :+ col("key"): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("c_est"))
  }
}
