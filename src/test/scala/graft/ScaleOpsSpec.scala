package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin attaches most recent right row at or before left") {
    val quotes = Seq( // key, t, price
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 99.0))
      .toDF("sym", "t", "price")
    val trades = Seq( // key, t, qty
      ("A", 0L, 1L), ("A", 5L, 2L), ("A", 7L, 3L), ("A", 100L, 4L),
      ("B", 3L, 5L), ("B", 4L, 6L))
      .toDF("sym", "t", "qty")
    val got = ScaleOps.asOfJoin(trades, quotes, Seq("sym"), "t", "t",
      Map("price" -> "quote_price"))
      .select("sym", "t", "qty", "quote_price")
      .as[(String, Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      ("A", 0L, 1L, None),          // no quote yet
      ("A", 5L, 2L, Some(11.0)),    // inclusive tie takes the t=5 quote
      ("A", 7L, 3L, Some(11.0)),
      ("A", 100L, 4L, Some(12.0)),
      ("B", 3L, 5L, None),
      ("B", 4L, 6L, Some(99.0))))
  }

  test("saltedJoin equals the plain join result") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val parts = graft.core.Tables.part(spark, "/root/testdata/sf0.001")
      .select("p_partkey", "p_name")
    val plain = li.join(parts, li("l_partkey") === parts("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_name")
      .collect().map(_.toString).sorted.toSeq
    val salted = ScaleOps.saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), parts,
      Seq("p_partkey"), saltBuckets = 8)
      .select("l_orderkey", "l_linenumber", "p_name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }
}
