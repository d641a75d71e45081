package graft

import org.apache.spark.sql.functions._

/** Scan-efficiency guardrails: predicate pushdown and column pruning
  * must reach the parquet scan for the simple relational queries —
  * the PLANS.md claims, held by a test instead of prose. */
class PushdownSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def scanLine(planned: org.apache.spark.sql.DataFrame): String =
    planned.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Scan parquet")).mkString("\n")

  test("q_filter_eq pushes its predicate into the parquet scan") {
    val df = SparkEntry.queries("q_filter_eq")(spark, sfDir)
    val scan = scanLine(df)
    assert(scan.contains("PushedFilters: [") && !scan.contains("PushedFilters: []"),
      s"expected pushed filters in:\n$scan")
  }

  test("q_scan_project prunes the read schema to selected columns") {
    val df = SparkEntry.queries("q_scan_project")(spark, sfDir)
    val full = graft.core.Tables.lineitem(spark, sfDir).columns.length
    val read = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // projection reads strictly fewer columns than the table carries
    val struct = read.substring(read.indexOf("ReadSchema: struct<"))
    val nRead = struct.takeWhile(_ != '>').count(_ == ':')
    assert(nRead > 0 && nRead < full,
      s"expected pruned ReadSchema (<$full cols) in: $read")
  }

  test("q_token_budget prunes the documents scan to id + text") {
    val df = SparkEntry.queries("q_token_budget")(spark, sfDir)
    val read = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    val struct = read.substring(read.indexOf("ReadSchema: struct<"))
    val nRead = struct.takeWhile(_ != '>').count(_ == ':')
    val full = graft.core.Tables.documents(spark, sfDir).columns.length
    assert(nRead > 0 && nRead < full,
      s"expected pruned ReadSchema (<$full cols) in: $read")
  }

  test("filtered ANN pushes the metadata predicate to the parquet scan") {
    // the X198 design claim held by a test: over a RAW scan (the gate
    // caches the corpus for tier sharing, which absorbs the filter
    // into the cache scan instead), the binary tier's pre-filter
    // reaches the parquet reader as a pushed filter — at 100 TB this
    // is row-group pruning, not a post-scan filter
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val plan = graft.operators.Similarity.filteredBinaryRerankTopK(
      emb, q, col("label") === 3, coarseK = 50, k = 10, dims = 64)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString(" | ")
    assert(pushed.contains("EqualTo(label,3)"),
      s"label predicate must reach the scan: $pushed")
  }

  test("dimension joins in the flagship edges broadcast, not shuffle") {
    val plan = SparkEntry.nationTradeEdges(spark, sfDir)
      .queryExecution.executedPlan.toString
    val nBroadcast = plan.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin")
    assert(nBroadcast >= 4, s"expected ≥4 broadcast dim joins:\n$plan")
  }
}
