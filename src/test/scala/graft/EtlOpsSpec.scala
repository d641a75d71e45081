package graft

import org.apache.spark.sql.functions._
import graft.operators.EtlOps

class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("W1 latestPerGroup keeps newest year, tie-broken by input order") {
    val df = Seq(
      ("a", 2020.0, 1L), ("a", 2021.0, 2L), ("a", 2021.0, 3L),
      ("b", 2019.0, 4L))
      .toDF("country", "year", "_input_row_id")
    val got = EtlOps.latestPerGroup(df, Seq("country"), "year")
      .select("country", "_input_row_id").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 4L)) // first of the 2021 ties
  }

  test("W1 latestPerGroup: null years sort last") {
    val df = Seq(("a", Some(2020.0), 1L), ("a", None, 2L))
      .toDF("country", "year", "_input_row_id")
    val got = EtlOps.latestPerGroup(df, Seq("country"), "year")
      .select("_input_row_id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("W2 dedupByOrder: composite ordering (year desc, amount desc, type asc)") {
    val df = Seq(
      ("x", "y", 2020.0, 10.0, "imports", 1L),
      ("x", "y", 2020.0, 10.0, "exports", 2L), // exports wins type asc
      ("x", "y", 2021.0, 1.0, "imports", 3L))  // 2021 beats both
      .toDF("imports", "exports", "year", "amount", "trade_type", "_input_row_id")
    val got = EtlOps.dedupByOrder(df, Seq("imports", "exports"),
      Seq(desc_nulls_last("year"), desc_nulls_last("amount"),
        asc("trade_type"), asc("_input_row_id")))
      .select("_input_row_id").as[Long].collect()
    assert(got.toSeq == Seq(3L))
  }

  test("W3 groupRankDesc: pandas rank('min') semantics — gaps on ties") {
    val df = Seq(("g", 30.0), ("g", 30.0), ("g", 20.0), ("g", 40.0))
      .toDF("k", "v")
    val got = EtlOps.groupRankDesc(df, "k", "v", "r")
      .select("v", "r").as[(Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((20.0, 4.0), (30.0, 2.0), (30.0, 2.0), (40.0, 1.0)))
  }

  test("S8 assertUniqueKey: passes unique, throws on dup") {
    val ok = Seq(("a", 1), ("b", 2)).toDF("name", "v")
    EtlOps.assertUniqueKey(ok, Seq("name"))
    val dup = Seq(("a", 1), ("a", 2)).toDF("name", "v")
    intercept[IllegalArgumentException] {
      EtlOps.assertUniqueKey(dup, Seq("name"))
    }
  }

  test("F6-at-scale canonicalizeViaDim broadcast dim join") {
    val df = Seq("US", "France").toDF("country")
    val fixes = Seq(("US", "United States")).toDF("from", "to")
    val got = EtlOps.canonicalizeViaDim(df, "country", fixes)
      .as[String].collect().sorted
    assert(got.toSeq == Seq("France", "United States"))
  }
}
