package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f), 0.707107))
      .toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (c, want) => assert(c == want) }
  }

  test("bruteForceTopK returns k nearest with deterministic ranks") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((1L, 1), (2L, 2)))
  }

  test("lshTopK agrees with brute force for bucket-mates") {
    // vectors on the same side of every hyperplane share a signature;
    // a vector and its tiny perturbation must bucket together
    val base = (0 until 64).map(i => (i % 7).toFloat - 3.0f)
    val perturbed = base.updated(0, base(0) + 0.001f)
    val corpus = Seq((1L, base), (2L, perturbed)).toDF("vec_id", "embedding")
    val queries = Seq((9L, base)).toDF("q_id", "q_vec")
    val got = Similarity.lshTopK(corpus, queries, k = 2, bits = 8, dims = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("embeddingNearDupPairs finds the planted duplicate") {
    val base = (0 until 64).map(i => math.sin(i.toDouble).toFloat)
    val dup = base.updated(3, base(3) + 0.0001f)
    val other = (0 until 64).map(i => math.cos(i * 2.0).toFloat)
    val df = Seq((1L, base), (2L, dup), (3L, other)).toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDupPairs(df, threshold = 0.99, bits = 8, dims = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
