package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("custom expressions callable from plain SQL") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
        (3L, "something else entirely")).toDF("id", "text")
      .createOrReplaceTempView("sql_docs")
    val r = spark.sql(
      """SELECT id,
                simhash64(transform(split(lower(text), '\\s+'), t -> xxhash64(t))) AS fp,
                minhash_signature(transform(split(lower(text), '\\s+'),
                                            t -> xxhash64(t)), 8) AS sig
         FROM sql_docs""").collect()
    val byId = r.map(row => row.getLong(0) ->
      (row.getLong(1), row.getAs[scala.collection.Seq[Long]](2).toSeq)).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(1L)._1 != byId(3L)._1)
    assert(byId(1L)._2.length == 8)
  }

  test("extensions install at session-build time") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session; registerAll covers that
    // case in the other test — here just assert the function resolves
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT simhash64(array(1L, 2L)) AS fp").head.getLong(0) ==
      graft.functions.HashExprs.simhashRef(Array(1L, 2L)))
  }
}
