package graft

import graft.graph.Ranks

/** The driver-local and distributed rank paths must agree (identical
  * series math; fold order may differ at float-ulp level). */
class RanksLocalDistSpec extends SparkSpec {
  import spark.implicits._

  test("local and GraphX paths agree on the nation trade graph") {
    val edges = SparkEntry.nationTradeEdges(spark, "/root/testdata/sf0.001")
    val local = Ranks.rankTable(edges, "src_nation", "dst_nation")
      .select("name", "pagerank", "articlerank")
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val dist = Ranks.rankTable(edges, "src_nation", "dst_nation",
      localThreshold = 0L)
      .select("name", "pagerank", "articlerank")
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(local.keySet == dist.keySet && local.nonEmpty)
    for ((k, (lp, la)) <- local) {
      val (dp, da) = dist(k)
      assert(math.abs(lp - dp) <= math.abs(lp) * 1e-12, s"$k pagerank $lp vs $dp")
      assert(math.abs(la - da) <= math.abs(la) * 1e-12, s"$k articlerank $la vs $da")
    }
  }
}
