package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schemas + readers for the reference's CSV tables
  * (`/root/reference/output/` CSVs, declared dtypes at
  * `preprocess_upload_neo4j.py:83-97` — see FIXTURES.md §A).
  *
  * The reference's ETL has order-dependent semantics (stable
  * sort-then-keep-first dedup, `preprocess_upload_neo4j.py:139-140,181-182`),
  * so every read captures `_input_row_id` as an explicit tie-break
  * column. At 100 TB an input would carry its own ordering key; for
  * these single-small-file CSVs `monotonically_increasing_id()` over a
  * single input split reproduces file order deterministically.
  */
object FactbookSchemas {

  /** exports/imports/gdp/real_gdp/real_gdp_per_capita/gdp_per_capita */
  val amountSeries: StructType = StructType(Seq(
    StructField("link", StringType),
    StructField("country", StringType),
    StructField("amount", DoubleType),
    StructField("note", StringType),
    StructField("year", DoubleType),
    StructField("retrieved", StringType)))

  /** exports_partners / imports_partners */
  val partners: StructType = StructType(Seq(
    StructField("link", StringType),
    StructField("country", StringType),
    StructField("year", DoubleType),
    StructField("trade_country", StringType),
    StructField("percentage", DoubleType),
    StructField("trade_type", StringType),
    StructField("retrieved", StringType)))

  /** exports_goods / imports_goods */
  val goods: StructType = StructType(Seq(
    StructField("goods", StringType),
    StructField("country", StringType),
    StructField("link", StringType),
    StructField("year", DoubleType),
    StructField("rank", IntegerType),
    StructField("trade_type", StringType),
    StructField("retrieved", StringType)))

  /** population.csv — reference reads it all-string
    * (`preprocess_upload_neo4j.py:110`); we type it but keep year Double. */
  val population: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("population", DoubleType),
    StructField("year", DoubleType),
    StructField("retrieved", StringType)))

  val countryRegion: StructType = StructType(Seq(
    StructField("regions", StringType),
    StructField("country", StringType),
    StructField("link", StringType),
    StructField("rank", IntegerType),
    StructField("retrieved", StringType)))

  val goodsGrouping: StructType = StructType(Seq(
    StructField("goods", StringType),
    StructField("mapped_good", StringType)))

  /** Header CSV read with declared schema (S5) + stable `_input_row_id`.
    * Quoting handles names with commas (`"Korea, South"`). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
      .withColumn("_input_row_id", monotonically_increasing_id())
}
