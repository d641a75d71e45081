package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FactbookFunctions._

/** Ingestion-side record extraction (SURVEY §2.1 S2/S3 + §2.3):
  * the reference fetches Factbook field pages and walks
  * `div class="pb30"` blocks with BeautifulSoup
  * (`scrape_cia.py:43-62` and friends). Re-expressed Spark-first:
  * raw page HTML arrives as a `Dataset[String]`/DataFrame column
  * (zero-egress: fixtures or an upstream fetcher produce it), div
  * blocks explode into rows, and anchor href/text extraction is pure
  * `regexp_extract` column work — fully distributed, codegen'd, no
  * parser library on the executor hot path (Factbook field pages are
  * machine-generated and regular; a full HTML parser would be a
  * per-row UDF for no extra fidelity).
  *
  * Downstream scalar parsing (currency, year, percentage, name fixes)
  * is FactbookFunctions — the same functions the ETL uses.
  */
object FactbookScrape {

  /** Links the reference skips (`scrape_cia.py:297-302`). */
  val skipLinks: Seq[String] = Seq(
    "/the-world-factbook/countries/world",
    "/the-world-factbook/countries/european-union",
    "/the-world-factbook/countries/antarctica",
    "/the-world-factbook/countries")

  /** S2 — explode a page into per-country div blocks:
    * one row per `<div class="pb30">…</div>`. */
  def divBlocks(pages: DataFrame, htmlCol: String): DataFrame =
    pages.select(
      posexplode(
        // non-greedy block capture; Factbook markup nests no pb30 divs
        regexp_extract_all(col(htmlCol),
          lit("(?s)<div class=\"pb30\">(.*?)</div>"), lit(1)))
        .as(Seq("block_pos", "block")))

  /** S2 — anchor href + link text from a block. */
  def anchor(block: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(block, "<a href=\"([^\"]+)\"", 1)

  def anchorText(block: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // text of the anchor element, tags stripped, whitespace collapsed
    trim(regexp_replace(
      regexp_replace(regexp_extract(block, "(?s)<a [^>]*>(.*?)</a>", 1),
        "<[^>]+>", " "),
      "\\s+", " "))

  /** Body text of the block after the anchor (the field value),
    * tags stripped — the `" ".join(lines)` shape of scrape_cia. */
  def bodyText(block: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(regexp_extract(block, "(?s)</a>(.*)$", 1), "<[^>]+>", " "),
      "\\s+", " "))

  /** S3 — the reference's link filter: country pages only, skip list
    * excluded (`scrape_cia.py:53-55`). */
  def countryLinkFilter(df: DataFrame, linkCol: String): DataFrame =
    df.filter(col(linkCol).contains("/the-world-factbook/countries") &&
      !col(linkCol).isin(skipLinks: _*))

  /** Full amount-series extraction from exports/imports/gdp-style
    * pages (`scrape_cia.py:42-87`): one output row per (country,
    * year-amount line), with currency parsed to dollars and the year
    * pulled from the trailing "(YYYY est.)". */
  def amountSeries(pages: DataFrame, htmlCol: String): DataFrame = {
    val blocks = divBlocks(pages, htmlCol)
      .select(anchor(col("block")).as("link"),
        anchorText(col("block")).as("country"),
        bodyText(col("block")).as("body"))
    val filtered = countryLinkFilter(blocks, "link")
      .withColumn("country", canonicalCountry(col("country")))
    // the reference splits the body on "est.)" boundaries keeping only
    // lines matching the (\d{4}…) guard (`scrape_cia.py:58-62`)
    filtered
      .select(col("link"), col("country"),
        explode(filter(
          transform(split(col("body"), "(?<=\\))\\s+"), x => trim(x)),
          x => x.rlike("\\(\\d{4}.*\\)"))).as("amount_text"))
      .select(col("link"), col("country"), col("amount_text"),
        currencyToDollars(col("amount_text")).as("amount"),
        yearFromParen(col("amount_text")).as("year"),
        current_date().cast("string").as("retrieved"))
  }
}
