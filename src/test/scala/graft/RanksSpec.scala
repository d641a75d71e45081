package graft

import graft.graph.Ranks

/** Graph-centrality checks against closed-form/reference-recurrence
  * values (SURVEY §5 item 5). */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // 4-node graph: a->b, a->c, b->c, c->a, d->c (d dangling in-degree)
  private def edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    .toDF("src", "dst")

  /** Scalar model of the GDS delta-propagation semantics the engine
    * implements (verified bit-exact vs golden in FactbookEtlSpec):
    * maxIterations=n -> rank = 0.15·Σ_{k=0..n-1}(0.85·Mᵀ)^k·1. */
  private def expectedSeries(iters: Int, denomAdd: Double): Map[String, Double] = {
    val out = Map("a" -> Seq("b", "c"), "b" -> Seq("c"), "c" -> Seq("a"), "d" -> Seq("c"))
    val verts = Seq("a", "b", "c", "d")
    var term = verts.map(_ -> 0.15).toMap
    var rank = term
    for (_ <- 1 until iters) {
      term = verts.map { v =>
        val in = out.collect { case (u, ns) if ns.contains(v) =>
          term(u) / (ns.size + denomAdd) }
        v -> 0.85 * in.sum
      }.toMap
      rank = verts.map(v => v -> (rank(v) + term(v))).toMap
    }
    rank
  }

  private def expectedPageRank(iters: Int): Map[String, Double] =
    expectedSeries(iters, 0.0)

  private def expectedArticleRank(iters: Int): Map[String, Double] = {
    val avgOutDeg = 5.0 / 4 // 5 edges, 4 vertices
    expectedSeries(iters, avgOutDeg)
  }

  test("PageRank matches the scalar power iteration within 1e-12") {
    val got = Ranks.rankTable(edges, "src", "dst")
      .select("name", "pagerank").as[(String, Double)].collect().toMap
    val want = expectedPageRank(20)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"vertex $k")
  }

  test("ArticleRank matches the scalar recurrence within 1e-12") {
    val got = Ranks.rankTable(edges, "src", "dst")
      .select("name", "articlerank").as[(String, Double)].collect().toMap
    val want = expectedArticleRank(20)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"vertex $k")
  }

  test("rank ordering: heavy in-link vertex c ranks first") {
    val got = Ranks.rankTable(edges, "src", "dst")
      .select("name", "pagerank").as[(String, Double)].collect().toMap
    assert(got("c") > got("a") && got("a") > got("b") && got("b") > got("d"))
  }
}
