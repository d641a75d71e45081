package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TopK}

/** The typed top-k Aggregator must produce exactly the window-based
  * top-k (same scores, ids, and ranks), while shuffling only bounded
  * per-partition heaps. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup == window bruteForceTopK on real embeddings") {
    val corpus = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val windowed = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("q_id", "vec_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

    val scored = corpus.join(broadcast(queries))
      .withColumn("score", Similarity.cosineAuto(corpus, col("embedding"), col("q_vec")))
      .select("q_id", "vec_id", "score")
    val agged = TopK.topKPerGroup(scored, "q_id", "vec_id", "score", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet

    assert(agged == windowed)
    assert(windowed.nonEmpty)
  }

  test("ties broken by id ascending, identical to RANK semantics") {
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.9), (1L, 8L, 0.1))
      .toDF("g", "id", "s")
    val got = TopK.topKPerGroup(scored, "g", "id", "s", k = 3)
      .select("id", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((7L, 1), (3L, 2), (10L, 3)))
  }
}
