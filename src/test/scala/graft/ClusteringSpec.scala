package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def points(ps: (Long, Seq[Float])*) =
    ps.toDF("vec_id", "embedding")

  test("kmeans separates two well-spaced blobs") {
    val df = points(
      1L -> Seq(0.0f, 0.1f), 2L -> Seq(0.1f, 0.0f),
      3L -> Seq(10.0f, 10.1f), 4L -> Seq(10.1f, 9.9f))
    val got = Clustering.kmeansFixedPoint(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got.size == 4)
    assert(got(1L) == got(2L), "near-origin blob must share a cluster")
    assert(got(3L) == got(4L), "far blob must share a cluster")
    assert(got(1L) != got(3L), "blobs must separate")
  }

  test("kmeans is deterministic run-to-run") {
    val df = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run() = Clustering.kmeansFixedPoint(df, "vec_id", "embedding", k = 4, iters = 2)
      .select("vec_id", "cluster", "dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("kmeans final dist is the exact fixed-point distance to the winning centroid") {
    val df = points(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 0.0f), 3L -> Seq(0.0f, 2.0f))
    val got = Clustering.kmeansFixedPoint(df, "vec_id", "embedding", k = 1, iters = 2)
      .select("vec_id", "cluster", "dist").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // single cluster: after the update the centroid is the exact
    // integer mean: x = floor((0+1e6+0)/3) = 333333, y = floor((0+0+2e6)/3) = 666666
    val cx = 333333L; val cy = 666666L
    def d(x: Long, y: Long) = (x - cx) * (x - cx) + (y - cy) * (y - cy)
    assert(got(1L) == d(0L, 0L))
    assert(got(2L) == d(1000000L, 0L))
    assert(got(3L) == d(0L, 2000000L))
  }

  test("kmeans survives empty clusters (k > distinct points)") {
    val df = points(1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.0f, 0.0f),
      3L -> Seq(5.0f, 5.0f))
    val got = Clustering.kmeansFixedPoint(df, "vec_id", "embedding", k = 3, iters = 3)
    assert(got.count() == 3)
  }

  test("trained-IVF finds each in-corpus query itself at rank 1") {
    val got = graft.queries.Extensions
      .embedIvfTrained(spark, "/root/testdata/sf0.001")
      .select("q_id", "vec_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val r1 = rows.find(_._4 == 1).get
      // the query vector is in the corpus and probes its own cell:
      // exact self-match at rank 1 with cosine 1
      assert(r1._2 == q && r1._3 == 1.0, s"query $q: $r1")
      assert(rows.length <= 10)
    }
  }
}
