package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sort the
  * table by the bit-interleaved key of two columns before writing, so
  * parquet row-group min/max stats become selective for 2-D box
  * predicates on EITHER column. A linear sort clusters one dimension
  * and scatters the other; the Morton order keeps both dimensions
  * locally contiguous, so a box query skips most row groups at the
  * reader (verified against footer stats in ZOrderSpec).
  *
  * At 100 TB this is a one-off layout job: range-partition by z so
  * files are non-overlapping z-ranges, sort within partitions, write.
  * Reads stay plain `spark.read.parquet` — the benefit arrives through
  * ordinary stats pruning, no custom reader needed.
  */
object ZOrderLayout {

  /** Morton z-value: bit-interleave the low `bits` bits of two
    * non-negative integer columns (x even positions, y odd). Pure
    * codegen'd bit arithmetic — `2*bits` must stay < 63. Keys wider
    * than `bits` bits keep layout locality only in their low bits
    * (interleave-from-the-top variants exist; not needed here). */
  def zValue(x: Column, y: Column, bits: Int = 20): Column = {
    require(bits > 0 && 2 * bits < 63, s"need 0 < bits < 32, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      // ((x >> i) & 1) << 2i  ==  (x & (1<<i)) << i ; y lands one left
      acc
        .bitwiseOR(shiftleft(xl.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(yl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** The same z-value as DuckDB SQL (generated, identical bit terms) so
    * the layout key itself is oracle-verifiable. OR-terms are grouped
    * 8-wide to stay under DuckDB's binder recursion depth. */
  def zValueSql(x: String, y: String, bits: Int = 20): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((CAST($x AS BIGINT) & ${1L << i}) << $i)",
        s"((CAST($y AS BIGINT) & ${1L << i}) << ${i + 1})")
    }
    terms.grouped(8).map(_.mkString("(", " | ", ")")).mkString(" | ")
  }

  /** Write `df` z-ordered by (xCol, yCol): range-partition on the
    * z-value (files = disjoint z-ranges), sort within partitions, drop
    * the helper column. `parts` controls target file count. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, parts: Int, bits: Int = 20,
      options: Map[String, String] = Map.empty): Unit = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.withColumn("_z", z)
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").options(options).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
