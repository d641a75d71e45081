package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/row format round trips beyond parquet — the ingest/export
  * edges of the engine. Notes for 100 TB use:
  *
  *  - ORC: columnar like parquet (predicate pushdown, column pruning,
  *    stripe statistics); the choice between them is ecosystem, not
  *    capability. Spark's native vectorized ORC reader applies the
  *    same `PushedFilters`.
  *  - JSON-lines: the interchange format of scraped/text corpora. ALWAYS
  *    read with an explicit schema at scale: schema inference is a full
  *    extra pass over every byte before the first real job. Writers
  *    must treat JSONL as lossy-at-the-edges (no int64 precision
  *    guarantee in consumers, no binary) — it is an exchange format,
  *    not a storage format.
  */
object FormatSinks {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Explicit-schema JSONL read — no inference pass. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
