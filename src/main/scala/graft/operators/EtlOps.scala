package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators distilled from the reference's ETL
  * (SURVEY §2.4–2.7), expressed shuffle-consciously:
  *
  *  - latest-per-group / conflict-dedup are single-shuffle window ops
  *    (partitionBy the dedup key); at 100 TB the shuffle is unavoidable
  *    for exact semantics, but it is ONE exchange reused by the
  *    row_number filter — no extra sort pass.
  *  - dictionary joins stay broadcast (`broadcast()`), matching the
  *    reference's hash-map lookups (`preprocess_upload_neo4j.py:194-200`).
  */
object EtlOps {

  /** W1 — latest-per-group (`preprocess_upload_neo4j.py:139-140`):
    * keep the most-recent-`orderCol` row per `key`, ties broken by
    * `tieBreak` ascending (the reference relies on input order; callers
    * pass `_input_row_id`). One shuffle on `key`. */
  def latestPerGroup(df: DataFrame, key: Seq[String], orderCol: String,
      tieBreak: String = "_input_row_id"): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(desc_nulls_last(orderCol), col(tieBreak).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** W2 — conflict-resolving dedup (`preprocess_upload_neo4j.py:181-182`):
    * per `key`, keep the first row under an explicit multi-column
    * ordering. */
  def dedupByOrder(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** W3 — group-wise min-rank descending
    * (`preprocess_upload_neo4j.py:184-185`): pandas `rank("min",
    * ascending=False)` == SQL `RANK()` over `desc`. Cast double for
    * golden parity. */
  def groupRankDesc(df: DataFrame, key: String, by: String, as: String): DataFrame =
    df.withColumn(as,
      rank().over(Window.partitionBy(col(key)).orderBy(desc_nulls_last(by)))
        .cast("double"))

  /** F6 at scale — canonicalization via a broadcast dimension join
    * instead of a CASE chain: `fixes(from, to)`. */
  def canonicalizeViaDim(df: DataFrame, colName: String, fixes: DataFrame): DataFrame =
    df.join(broadcast(fixes.withColumnRenamed("from", colName)),
        Seq(colName), "left")
      .withColumn(colName, coalesce(col("to"), col(colName)))
      .drop("to")

  /** S8 — key-uniqueness assertion (Neo4j NODE KEY constraint
    * semantics, `preprocess_upload_neo4j.py:47-54`): fail fast if any
    * key value occurs more than once. */
  def assertUniqueKey(df: DataFrame, key: Seq[String]): Unit = {
    val dups = df.groupBy(key.map(col): _*).count().filter(col("count") > 1)
    val n = dups.limit(1).count()
    require(n == 0, s"duplicate keys in ${key.mkString(",")}")
  }
}
