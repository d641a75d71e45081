package graft

import org.apache.spark.sql.SparkSession

/** BPE training job-count probe: `runMain graft.BpeJobs <numMerges>
  * [sfDir]` runs [[graft.operators.Corpus.bpeMerges]] at the given
  * merge count and prints total Spark jobs + wall time. Dev tool for
  * the documented job-count bound of the greedy global-argmax
  * recurrence (PLANS.md "BPE training bound"). */
object BpeJobs {
  def main(args: Array[String]): Unit = {
    val numMerges = args(0).toInt
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
    val t0 = System.nanoTime()
    val n = graft.operators.Corpus.bpeMerges(docs, "doc_id", "text",
      numMerges).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-jobs] merges=$numMerges rows=$n jobs=${jobs.get()} " +
      f"wall=$sec%.1fs jobs/merge=${jobs.get().toDouble / numMerges}%.2f")
    spark.stop()
  }
}
