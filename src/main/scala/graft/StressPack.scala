package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: hunts run-to-run nondeterminism in the packing queries
  * (the two driver-gate hash failures in round 2). Runs q_seq_pack and
  * q_curate repeatedly in one JVM — each iteration interleaves junk
  * jobs so RDD ids (and therefore range-sampler seeds) shift — and
  * compares a canonical hash of the sorted result across iterations.
  */
object StressPack {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = if (args.length > 1) args(1).toInt else 10
    val queryNames =
      if (args.length > 2) args.drop(2).toSeq else Seq("q_seq_pack", "q_curate")
    val spark = SparkSession.builder()
      .appName("graft-stress-pack").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def canonHash(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.foreach(r => md.update(r.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }

    for (name <- queryNames) {
      val hashes = (1 to iters).map { i =>
        // shift the global RDD-id counter by a pseudo-random amount so
        // the range partitioner samples with different seeds each pass
        val junk = 1 + (i * 7) % 13
        (0 until junk).foreach { j =>
          spark.range(1000 + j).select(sum(col("id"))).collect()
        }
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val h = canonHash(name)
        System.err.println(f"[stress] $name iter $i -> $h (${(System.nanoTime() - t0) / 1e9}%.2fs)")
        h
      }
      val ok = hashes.distinct.size == 1
      System.err.println(s"[stress] $name deterministic=$ok distinct=${hashes.distinct.size}")
      if (!ok) System.err.println(s"[stress] $name HASHES: ${hashes.mkString(", ")}")
    }
    spark.stop()
  }
}
