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

  test("dimension joins in the flagship edges broadcast, not shuffle") {
    val plan = SparkEntry.nationTradeEdges(spark, sfDir)
      .queryExecution.executedPlan.toString
    val nBroadcast = plan.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin")
    assert(nBroadcast >= 4, s"expected ≥4 broadcast dim joins:\n$plan")
  }
}
