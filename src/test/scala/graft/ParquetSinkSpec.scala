package graft

import org.apache.spark.sql.functions._
import graft.sources.ParquetSink

class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tempTarget(): String =
    java.nio.file.Files.createTempDirectory("graft-sink-spec").toString

  test("partitioned write lays out Hive-style dirs and round-trips") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val target = tempTarget()
    ParquetSink.writePartitioned(docs, target, Seq("lang"))
    val dirs = new java.io.File(target).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")),
      s"expected lang=<value> partition dirs, got $dirs")
    // full round trip (partition column moves position, values survive)
    val back = ParquetSink.readPartitioned(spark, target)
      .select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    val want = docs.select("doc_id", "lang", "source", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    assert(back == want && want.nonEmpty)
  }

  test("partition-column filter prunes at the directory level") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val target = tempTarget()
    ParquetSink.writePartitioned(docs, target, Seq("lang"))
    val pruned = ParquetSink.readPartitioned(spark, target)
      .filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(lang"),
      s"lang filter must reach PartitionFilters (directory pruning):\n$scan")
    // and the pruned read returns exactly the en rows
    val n = pruned.count()
    val want = docs.filter(col("lang") === "en").count()
    assert(n == want && n > 0)
  }
}
