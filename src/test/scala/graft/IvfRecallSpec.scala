package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** Recall evidence for the k-means-trained IVF index vs exact brute
  * force on real data — the accuracy/cost trade every ANN index is
  * judged by. nprobe=2 of 8 cells scans ~1/4 of the corpus; the spec
  * measures recall@10 and pins a conservative floor plus the exact
  * self-match guarantee. */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  test("trained IVF recall@10 vs brute force stays above the floor") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cents = Clustering.kmeansCentroidsDouble(
      emb, "vec_id", "embedding", k = 8, iters = 2)
    val approx = Similarity.ivfTopKWith(cents, emb, queries, k = 10, nprobe = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet == approx.keySet, "every query must return results")
    val recalls = exact.map { case (q, truth) =>
      (approx(q) & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // scanning ~2/8 of a near-uniform synthetic corpus: recall well
    // above the 25% random-scan baseline proves the cells carry signal
    assert(mean >= 0.35, f"mean recall@10 $mean%.3f below floor")
  }
}
