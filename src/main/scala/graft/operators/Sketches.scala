package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Engine-portable probabilistic sketches. Unlike
  * `approx_count_distinct` (whose HLL++ registers are an
  * implementation detail no other engine reproduces), these sketches
  * fix the hash (md5-derived), the register layout, and the estimator
  * arithmetic, so ANY engine computes the bit-identical estimate —
  * which is what makes a sketch result auditable across a
  * heterogeneous pipeline (Spark job today, DuckDB spot-check
  * tomorrow) and lets the driver's hash gate verify an approximate
  * operator exactly.
  */
object Sketches {

  /** Fixed-bin quantile sketch — the mergeable 100 TB quantile path
    * (exact `percentile` needs the values; this needs one bounded
    * histogram per group). Bin counts are mergeable partials; the
    * per-group cumulative window runs over the BIN table (bounded by
    * value-range/binWidth, never by row count). The p-quantile
    * estimate is the midpoint of the first bin whose cumulative count
    * reaches ceil(p·n) — guaranteed within binWidth/2 of an actual
    * rank-ceil(p·n) order statistic, and (unlike t-digest/KLL) a pure
    * deterministic function of the data, so any engine reproduces it
    * exactly. */
  def binnedQuantiles(df: DataFrame, groupCol: String, valCol: String,
      binWidth: Double, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .groupBy(col(groupCol), floor(col(valCol) / binWidth).cast("long").as("_bin"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_bin"))
    val wAll = Window.partitionBy(col(groupCol))
    bins
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("p", explode(typedlit(ps)))
      .filter(col("_cum") >= ceil(col("p") * col("_n")))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("_bin")).as("_qbin"))
      .select(col(groupCol), col("p"),
        round((col("_qbin") + 0.5) * binWidth, 6).as("estimate"))
  }

  /** Portable HyperLogLog distinct count (p=8, m=256 registers,
    * ~6.5% standard error — raise p for tighter bounds).
    *
    * Layout: h = 60-bit md5-derived hash; register = h mod 256; the
    * remaining 52 bits give rho = leading-zero count + 1, computed
    * EXACTLY in any engine as 53 − bitlength(suffix) via the minimal
    * binary-string length (`bin`), no floating point. Register maxes
    * aggregate with the classic two-shuffle mergeable-partials shape
    * (group×register, then group).
    *
    * The estimator stays engine-identical by doing ALL register math
    * in integers: Σ 2^(−M_j) is scaled by 2^53 so the harmonic-mean
    * denominator S = Σ 2^(53−M_j) is an exact BIGINT (≤ 2^61, no
    * overflow, order-independent) — the only doubles are one division
    * by S and the fixed alpha constant, identical IEEE ops in any
    * engine. Small-range (linear counting) correction applies below
    * 2.5·m when empty registers remain; result rounded to 4dp. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      hashSeed: Int = 777): DataFrame = {
    val gcols = groupCols.map(col)
    val hashed = df.select(gcols :+
      TextFunctions.hexHash60(col(valueCol).cast("string"), hashSeed).as("_h"): _*)
    val suffix = shiftright(col("_h"), 8)
    val rho = when(suffix === 0L, lit(53))
      .otherwise(lit(53) - length(bin(suffix)))
    val registers = hashed
      .select(gcols :+ (col("_h") % 256).as("_reg") :+ rho.as("_rho"): _*)
      .groupBy(gcols :+ col("_reg"): _*)
      .agg(max(col("_rho")).as("_M"))
    val folded = registers.groupBy(gcols: _*)
      .agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - _M)")) +
          (lit(256L) - count(lit(1))) * lit(1L << 53)).as("_S"),
        (lit(256L) - count(lit(1))).as("_zeros"))
    // alpha_256 = 0.7213/(1 + 1.079/m); kept as the same literal
    // expression the oracle writes so both sides produce the same double
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0) / col("_S").cast("double")
    val est = when(raw <= lit(640.0) && col("_zeros") > 0,
      lit(256.0) * log(lit(256.0) / col("_zeros").cast("double")))
      .otherwise(raw)
    folded.select(gcols :+ round(est, 4).as("hll_distinct"): _*)
  }

  /** The DuckDB oracle for [[hllDistinct]] over a given table/column —
    * generated here so the register layout and estimator arithmetic
    * live in exactly one place. */
  def hllDistinctSql(table: String, groupCols: Seq[String], valueCol: String,
      hashSeed: Int = 777): String = {
    val g = groupCols.mkString(", ")
    s"WITH h AS (SELECT $g, CAST('0x' || substr(md5('$hashSeed:' || CAST($valueCol AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM $table), " +
      s"b AS (SELECT $g, h % 256 AS reg, h >> 8 AS suffix FROM h), " +
      s"r AS (SELECT $g, reg, CASE WHEN suffix = 0 THEN 53 ELSE 53 - length(bin(suffix)) END AS rho FROM b), " +
      s"mx AS (SELECT $g, reg, max(rho) AS m FROM r GROUP BY ALL), " +
      s"s AS (SELECT $g, sum(CAST(1 AS BIGINT) << (53 - m)) + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS s, 256 - count(*) AS zeros FROM mx GROUP BY ALL), " +
      s"e AS (SELECT $g, CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))*CAST(65536.0 AS DOUBLE)*CAST(9007199254740992.0 AS DOUBLE)/CAST(s AS DOUBLE) AS raw, zeros FROM s) " +
      s"SELECT $g, round(CASE WHEN raw <= 640.0 AND zeros > 0 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE)/CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS hll_distinct FROM e"
  }
}
