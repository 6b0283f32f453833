package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus ingest — the interchange format LLM training
  * corpora actually arrive in (one JSON document per line: Common Crawl
  * derivatives, The Pile, RedPajama, every HuggingFace text dump). The
  * reference's ingest side reads whole-file JSON (GeoJSON feature
  * collections, [[GeoJson]]); a training pipeline's text side reads
  * line-delimited JSON at parquet-like scale, so this source is the
  * documents-table analogue of S7.
  *
  * Scale decisions:
  *  - **Schema is PINNED, never inferred.** Inference is a full extra
  *    pass over 100 TB before the first real row is read, and worse, the
  *    inferred type is corpus-dependent (a single `"quality": "high"`
  *    outlier flips the column to string and breaks every consumer
  *    downstream). Unknown top-level fields are simply not materialized.
  *  - **Line-delimited (the default), not multiLine** — files split at
  *    line boundaries, so a 10 GB shard parallelizes across tasks;
  *    multiLine JSON is one task per file.
  *  - **PERMISSIVE malformed-row policy with an explicit corrupt-record
  *    column**: a 100 TB crawl always contains broken lines; failing the
  *    job on line 3 billion is not an option, silently dropping rows is
  *    not auditable. Corrupt lines surface as rows with `bad_line` set
  *    and every schema field null — count them, alert on the rate, filter
  *    them out.
  */
object JsonLines {

  /** The corpus interchange schema: id + text + language tag, a nested
    * provenance/quality struct, and a tag array — nullable throughout
    * (real corpus lines omit fields freely). */
  val corpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("quality", DoubleType)))),
    StructField("tags", ArrayType(StringType)),
    StructField("bad_line", StringType)))

  /** Read a JSONL corpus into flat rows
    * (doc_id, text, lang, source, quality, n_tags, bad_line). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(corpusSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "bad_line")
      .json(path)
      .select(
        col("doc_id"), col("text"), col("lang"),
        col("meta.source").as("source"),
        col("meta.quality").as("quality"),
        size(col("tags")).as("n_tags"), // null when tags is absent (ANSI)
        col("bad_line"))
}
