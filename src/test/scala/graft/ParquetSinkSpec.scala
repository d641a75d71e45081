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
  test("dynamic partition overwrite replaces ONLY the delta's partitions") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val target = tempTarget()
    ParquetSink.writePartitioned(docs, target, Seq("lang"))
    def files(lang: String): Set[String] = {
      val d = new java.io.File(s"$target/lang=$lang")
      d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val deBefore = files("de")
    val delta = docs.filter(col("lang") === "en")
      .withColumn("n_chars", col("n_chars") * 10)
    ParquetSink.overwritePartitionsDynamic(delta, target, Seq("lang"))
    // untouched partition: identical files on disk
    assert(files("de") == deBefore && deBefore.nonEmpty)
    // refreshed partition: new content; others: original content
    val back = ParquetSink.readPartitioned(spark, target)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSet
    val want = docs.withColumn("n_chars",
      when(col("lang") === "en", col("n_chars") * 10).otherwise(col("n_chars")))
      .as[(Long, String, Long)].collect().toSet
    assert(back == want)
  }
}
