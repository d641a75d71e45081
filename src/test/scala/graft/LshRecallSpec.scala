package graft

import graft.operators.Dedup

/** Cross-operator consistency on real data: the MinHash-LSH path must
  * recover every high-similarity pair the exact inverted-index join
  * finds (recall check at a threshold where LSH banding is near-certain:
  * P[candidate] = 1-(1-s^3)^4 ≈ 0.996 at s=0.9). */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  test("minhash pairs cover all exact ngram-jaccard pairs at 0.9") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(exact.subsetOf(lsh) || (exact -- lsh).size <= exact.size / 10,
      s"LSH missed ${(exact -- lsh).size} of ${exact.size} exact pairs")
    // and LSH never invents pairs the exact measure rejects
    assert(lsh.subsetOf(exact))
  }
}
