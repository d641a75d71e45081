package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Unigram-LM training job-count probe: `runMain graft.UnigramJobs
  * <emRounds> [sfDir]` runs
  * [[graft.operators.Corpus.unigramLmScores]] at the given round
  * count and prints total Spark jobs + wall time — the [[BpeJobs]]
  * companion for the EM recurrence's documented O(emRounds) bound
  * (PLANS.md "Unigram-LM training bound"). Unlike BPE there is no
  * per-merge argmax collect: each round is a fixed CTE-shaped set of
  * vocab-scale jobs, so jobs/round should sit at a small constant
  * independent of vocabulary size. */
object UnigramJobs {
  def main(args: Array[String]): Unit = {
    val emRounds = args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = graft.core.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 3 = 0"))
    val t0 = System.nanoTime()
    val n = graft.operators.Corpus.unigramLmScores(docs, "doc_id", "text",
      maxPieceLen = 4, emRounds = emRounds).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[unigram-jobs] rounds=$emRounds vocab=$n jobs=${jobs.get()} " +
      f"wall=$sec%.1fs jobs/round=${jobs.get().toDouble / emRounds}%.2f")
    spark.stop()
  }
}
