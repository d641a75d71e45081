package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet sink + readback. At 100 TB the
  * partition columns ARE the pruning index: a reader filtering on them
  * never lists, opens, or scans the other directories
  * (`PartitionFilters` in the scan node), so layout choice here is a
  * query-time cost lever, not a storage detail. Partition by
  * low-cardinality routing columns (lang, source, date); never by
  * high-cardinality ids — millions of tiny directories kill the
  * listing phase before any byte is read. */
object ParquetSink {

  /** Write `df` partitioned by `partitionCols` (directory-encoded
    * key=value layout any parquet reader understands). Overwrite is
    * idempotent per target. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read a partitioned layout back; partition-column filters applied
    * by the caller prune at the directory level. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Dynamic partition overwrite — the incremental-refresh primitive:
    * only the partitions PRESENT in `df` are replaced; every other
    * partition's files are untouched (no read-modify-write of the
    * whole table). This is how a nightly job refreshes yesterday's
    * date partition under a 100 TB table: write cost scales with the
    * delta, not the table. Session conf is flipped to `dynamic` for
    * the write and restored after (the default `static` mode would
    * truncate the whole table first). */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally spark.conf.set(key, prev)
  }
}
