package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic parquet tables
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §B).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — at 100 TB these would be partitioned
  * tables behind a catalog; nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events parquet's `ts` physical type has varied across driver
    * generations — TIMESTAMP(NANOS) (Spark 4 rejects by default; read
    * as long via the legacy conf and integer-divide to micros, no
    * double rounding), TIMESTAMP(MICROS) without UTC adjustment (reads
    * as TIMESTAMP_NTZ; cast re-types it under the session zone — UTC
    * everywhere in this repo — so downstream event-time code sees one
    * type), or a plain UTC-adjusted timestamp. Normalize all three to
    * TimestampType here so no consumer branches on the source. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Widen a frame to the session's parallelism ONLY when its plan
    * yields fewer partitions than that (guide §2.4/§2.5): small
    * single-file bench inputs arrive as one scan split, which would
    * serialize per-row-heavy kernels on one core — those still get the
    * round-robin widening. A 100 TB input already carries thousands of
    * scan splits, and the old unconditional `repartition(parallelism)`
    * forced a full corpus round-robin exchange (plus Spark's
    * sort-before-repartition pass) that did nothing but REDUCE
    * parallelism to the core count. The probe is plan-side
    * (`rdd.getNumPartitions` — no job runs); results are identical
    * either way because every downstream consumer is
    * partitioning-agnostic (partial aggs, deterministic tie-breaks). */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
