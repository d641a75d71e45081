package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** The native codegen kernels must be bit-identical to the portable
  * HOF/literal forms (the DuckDB oracles mirror the portable forms). */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_simhash60 == HOF simhash60 on real documents") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val hof = docs.select(col("doc_id"), Dedup.simhash60(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    val nat = docs.select(col("doc_id"),
      call_function("graft_simhash60", TextFunctions.tokens(lower(col("text")))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(hof == nat)
    assert(hof.values.toSet.size > 1)
  }

  test("graft_hyperplane_sig == literal signSignature on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val lit8 = emb.select(col("vec_id"),
      Similarity.signSignature(col("embedding"), 8, 64).as("s"))
      .as[(Long, Long)].collect().toMap
    val nat = emb.select(col("vec_id"),
      call_function("graft_hyperplane_sig", col("embedding"), lit(8)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(lit8 == nat)
    assert(nat.values.toSet.size > 1)
  }

  test("graft_pop_value/pop_year == HOF F5 scan") {
    val texts = Seq(
      "8,403,994 (July 2021 est.)", "uninhabited", "1234 only year-ish",
      "Pop: 12 (2020 est.) extra 2021", "", "no digits here")
    val df = texts.toDF("txt")
    val hof = df.select(
      graft.functions.FactbookFunctions.populationValue(col("txt")),
      graft.functions.FactbookFunctions.yearFromPopText(col("txt")))
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    val nat = df.select(
      call_function("graft_pop_value", col("txt")),
      call_function("graft_pop_year", col("txt")))
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(hof == nat)
  }

  test("null tokens element and empty array handled") {
    val df = Seq(Seq.empty[String]).toDF("toks")
    val got = df.select(call_function("graft_simhash60", col("toks")))
      .as[Long].collect()
    assert(got.toSeq == Seq(0L))
  }

  test("kernels are callable from plain spark.sql text") {
    // the extension registers real FunctionRegistry entries, so the
    // SQL surface works for users who never touch the Scala API
    val row = spark.sql(
      """SELECT graft_rolling_hash('abc') AS rh,
        |       graft_simhash60(array('a','b')) AS sh,
        |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       graft_pop_value('12,345 (2020 est.)') AS pv
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("rh") == (('a' * 31L + 'b') * 31L + 'c') % 1000000007L)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("pv") == 12345.0)
  }
}
