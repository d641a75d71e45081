package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdfTopTerms matches a hand-computed fixture with tie-breaks") {
    // 4 docs; "common" appears in all (idf = ln(1) = 0), "rare" in one
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common alpha beta"),
      (3L, "common alpha"),
      (4L, "common"))
      .toDF("doc_id", "text")
    val got = Corpus.tfIdfTopTerms(docs, "doc_id", "text", 5)
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSet
    def sc(tf: Long, df: Long) =
      BigDecimal(tf * math.log(4.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(
      (1L, "rare", 2L, 1L, sc(2, 1), 1),
      (1L, "common", 1L, 4L, 0.0, 2),
      // beta (df=1) outscores alpha (df=2); common's ln(1)=0 ranks last
      (2L, "beta", 1L, 1L, sc(1, 1), 1),
      (2L, "alpha", 1L, 2L, sc(1, 2), 2),
      (2L, "common", 1L, 4L, 0.0, 3),
      (3L, "alpha", 1L, 2L, sc(1, 2), 1),
      (3L, "common", 1L, 4L, 0.0, 2),
      (4L, "common", 1L, 4L, 0.0, 1)))
  }

  test("tfIdfTopTerms keeps at most k terms per doc") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val top = Corpus.tfIdfTopTerms(docs, "doc_id", "text", 3)
    val perDoc = top.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr"))
      .as[(Long, Long, Int)].collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (_, n, maxr) => assert(n <= 3 && maxr <= 3) }
  }

  test("vocabulary ranks by count desc then term asc, bounded by topN") {
    val docs = Seq("b b b a a c", "a c", "d").toDF("text")
    val got = Corpus.vocabulary(docs, "text", 3)
      .select("term", "n", "rank").as[(String, Long, Int)].collect().toSeq
      .sortBy(_._3)
    // a and b both count 3 -> 'a' wins the tie; c=2; d cut by topN
    assert(got == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("vocabulary global top-N plans as TakeOrdered, no full sort") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.vocabulary(docs, "text", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N over counts should be a bounded per-partition heap:\n$plan")
  }
}
