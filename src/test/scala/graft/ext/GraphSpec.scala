package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Driver-side reference PageRank (dense, Map-based) — the textbook
    * recurrence the distributed operator must reproduce. */
  private def ref(edges: Set[(String, String)], iters: Int,
                  d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val mass = nodes.filterNot(deg.contains).map(pr).sum
      pr = nodes.map { v =>
        val c = edges.toSeq.filter(_._2 == v)
          .map { case (u, _) => pr(u) / deg(u) }.sum
        v -> ((1 - d) / n + d * c + d * mass / n)
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String)], iters: Int = 5)
  : Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank: symmetric cycle stays uniform") {
    val pr = run(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(pr.keySet == Set("a", "b", "c"))
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank: dangling node, self-loop and duplicate edges match " +
    "the reference recurrence; mass is conserved") {
    // dangling sink `d`, self-loop on `a`, duplicate edge a->b (dedup),
    // hub `b` with fan-out
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "a", "b" -> "c",
      "b" -> "d", "c" -> "a")
    val want = ref(edges.toSet, 5, 0.85)
    val got = run(edges)
    assert(got.keySet == want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-9, s"node $k: ${got(k)} vs $w")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRankConverged: tolerance stop agrees with a long fixed run " +
    "and conserves mass") {
    val edges = Seq("a" -> "b", "a" -> "a", "b" -> "c", "b" -> "d",
      "c" -> "a", "d" -> "a", "a" -> "c")
    val fixed = Graph.pageRank(edges.toDF("src", "dst"), 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val conv = Graph.pageRankConverged(edges.toDF("src", "dst"),
        tol = 1e-12, maxIters = 100)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(conv.keySet == fixed.keySet)
    for ((k, w) <- fixed)
      assert(math.abs(conv(k) - w) < 1e-9, s"node $k: ${conv(k)} vs $w")
    assert(math.abs(conv.values.sum - 1.0) < 1e-9)
  }

  test("pageRankConverged: the uniform-stationary cycle stops after " +
    "one residual check (maxIters is not the binding stop)") {
    // a→b→c→a is stationary at 1/3 — round 1's residual is ~0, so a
    // tight tolerance must still stop immediately with the exact vector
    val pr = Graph.pageRankConverged(
        Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst"),
        tol = 1e-15, maxIters = 50)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("topAuthorities: top-k by rank, deterministic ties, " +
    "TakeOrderedAndProject (no global sort)") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "d" -> "c",
      "c" -> "a").toDF("src", "dst")
    val ranks = Graph.pageRank(edges, 5)
    val top = Graph.topAuthorities(ranks, 2)
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k sorts globally:\n$p")
    val got = top.collect().map(r => (r.getString(0), r.getDouble(1)))
    val all = ranks.collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1))
    assert(got.toSeq == all.take(2).toSeq)
  }

  test("pageRank: invariant under input partitioning (decimal routing)") {
    val edges = Seq("a" -> "b", "b" -> "c", "b" -> "d", "c" -> "a",
      "d" -> "a", "a" -> "c")
    val one = Graph.pageRank(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val many = Graph.pageRank(edges.toDF("src", "dst").repartition(7), 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(one.toSeq == many.toSeq) // bit-exact, not approximate
  }
}
