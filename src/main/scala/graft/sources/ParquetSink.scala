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
}
