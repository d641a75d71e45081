package graft

import org.apache.spark.sql.functions._
import graft.operators.FactbookScrape

class FactbookScrapeSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><body>
      |<div class="pb30"><a href="/the-world-factbook/countries/france/"><h3>France</h3></a>
      |<p>$969.4 billion (2021 est.) $870 billion (2020 est.)</p></div>
      |<div class="pb30"><a href="/the-world-factbook/countries/world"><h3>World</h3></a>
      |<p>$1 trillion (2021 est.)</p></div>
      |<div class="pb30"><a href="/the-world-factbook/countries/korea-south/"><h3>Korea, South</h3></a>
      |<p>$769 billion (2021 est.)</p></div>
      |<div class="pb30"><a href="/other/page"><h3>Not a country</h3></a><p>$5 million (2020 est.)</p></div>
      |</body></html>""".stripMargin

  private def pages = Seq(page).toDF("html")

  test("S2: div blocks explode, anchors extracted") {
    val blocks = FactbookScrape.divBlocks(pages, "html")
    assert(blocks.count() == 4)
    val links = blocks.select(FactbookScrape.anchor(col("block"))).as[String].collect()
    assert(links.contains("/the-world-factbook/countries/france/"))
  }

  test("S3: skip list and non-country links filtered") {
    val got = FactbookScrape.amountSeries(pages, "html")
      .select("country").distinct().as[String].collect().toSet
    assert(got == Set("France", "South Korea")) // world + non-country dropped, name canonicalized
  }

  test("amount series: currency and year parsed per exploded line") {
    val fr = FactbookScrape.amountSeries(pages, "html")
      .filter(col("country") === "France")
      .select("amount", "year").as[(Double, Double)].collect().toSet
    assert(fr == Set((9.694e11, 2021.0), (8.7e11, 2020.0)))
  }
}
