package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, EtlOps}
import graft.functions.FactbookFunctions._

/** Property-based invariants (SURVEY §5 item 3), using ScalaCheck
  * generators sampled with fixed seeds (scalatestplus isn't available
  * offline, so sampling is explicit; determinism is a feature here —
  * failures reproduce). Each case materializes a small Spark plan, so
  * case counts are modest. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowGen = Gen.listOfN(30, for {
    key <- Gen.oneOf("a", "b", "c", "d")
    year <- Gen.chooseNum(1990.0, 2023.0)
    amount <- Gen.chooseNum(0.0, 1e6)
  } yield (key, year, amount))

  test("W2 dedupByOrder is idempotent and yields unique keys") {
    for (rows <- samples(rowGen, 6) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, y, a), i) => (k, y, a, i.toLong) }
        .toDF("k", "year", "amount", "_input_row_id")
      val order = Seq(desc_nulls_last("year"), desc_nulls_last("amount"),
        asc("_input_row_id"))
      val once = EtlOps.dedupByOrder(df, Seq("k"), order)
      val twice = EtlOps.dedupByOrder(once, Seq("k"), order)
      assert(once.collect().map(_.toString).sorted.toSeq ==
        twice.collect().map(_.toString).sorted.toSeq)
      val keys = once.select("k").as[String].collect()
      assert(keys.length == keys.distinct.length)
    }
  }

  test("W1 latestPerGroup survivor has the max year of its group") {
    for (rows <- samples(rowGen, 6) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, y, a), i) => (k, y, a, i.toLong) }
        .toDF("k", "year", "amount", "_input_row_id")
      val got = EtlOps.latestPerGroup(df, Seq("k"), "year")
        .select("k", "year").as[(String, Double)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      assert(got == want)
    }
  }

  test("F3 trailingPercentage is null or within [0, 10]") {
    val txtGen = Gen.oneOf(
      Gen.alphaStr,
      Gen.chooseNum(0, 999).map(n => s"Country $n%"),
      Gen.const("almost entirely X"))
    for (txts <- samples(Gen.listOfN(20, txtGen), 6) if txts.nonEmpty) {
      val got = txts.toDF("t")
        .select(trailingPercentage(col("t")).as("p")).collect()
      got.foreach { r =>
        if (!r.isNullAt(0)) {
          val p = r.getDouble(0)
          assert(p >= 0.0 && p <= 10.0, s"pct $p")
        }
      }
    }
  }

  test("exact dedup: survivors unique per normalized text, all groups covered") {
    val docGen = Gen.listOfN(15, for {
      base <- Gen.oneOf("alpha beta gamma", "delta epsilon", "zeta")
      spaces <- Gen.oneOf(" ", "  ")
      upper <- Gen.oneOf(true, false)
    } yield {
      val t = base.replace(" ", spaces)
      if (upper) t.toUpperCase else t
    })
    def norm(t: String): String =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
    for (texts <- samples(docGen, 6) if texts.nonEmpty) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exactDedup(df, "text", "doc_id")
        .select("text").as[String].collect().map(norm)
      assert(out.length == out.distinct.length)
      assert(out.toSet == texts.map(norm).toSet)
    }
  }
}
