package graft

import org.apache.spark.sql.functions._

/** Cross-checks the distributed triangle enumeration against a
  * driver-side brute force over the same (small) nation graph. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("q_triangles matches brute-force triangle participation") {
    val dir = "/root/testdata/sf0.001"
    val und = SparkEntry.nationTradeEdges(spark, dir)
      .select(least(col("src_nation"), col("dst_nation")).as("a"),
        greatest(col("src_nation"), col("dst_nation")).as("b"))
      .distinct().as[(String, String)].collect().toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
    val expected = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
      (a, b, c) = (verts(i), verts(j), verts(k))
      if und((a, b)) && und((b, c)) && und((a, c))
    } { expected(a) += 1; expected(b) += 1; expected(c) += 1 }
    val got = graft.queries.RankQueries.triangles(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == expected.toMap)
  }
}
