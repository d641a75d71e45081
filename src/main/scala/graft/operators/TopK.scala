package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregator (SURVEY §2.9 "top-k `Aggregator`"): keeps a
  * bounded per-partition heap of (score, id) and merges heaps, so the
  * shuffle carries k rows per (group × partition) instead of the whole
  * scored set — the map-side-combine shape a window `row_number`
  * cannot produce. Deterministic: ordering is (score desc, id asc),
  * identical to the window form's tie-break, so results are
  * interchangeable with `Similarity.bruteForceTopK`.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  /** Min-heap of the current top k under (score desc, id asc):
    * the WORST kept entry sits at the head for O(log k) replacement.
    * "a beats b" == a.score > b.score || (equal && a.id < b.id). */
  private def beats(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil

    override def reduce(buf: List[Entry], e: Entry): List[Entry] =
      if (buf.size < k) e :: buf
      else {
        val worst = buf.reduceLeft((a, b) => if (beats(a, b)) b else a)
        if (beats(e, worst)) {
          // evict exactly ONE occurrence — filterNot would drop every
          // copy of a duplicated (score, id) entry and shrink the buffer
          val i = buf.indexOf(worst)
          e :: (buf.take(i) ::: buf.drop(i + 1))
        } else buf
      }

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(reduce)

    override def finish(buf: List[Entry]): Seq[Entry] =
      buf.sortWith(beats)

    override def bufferEncoder: Encoder[List[Entry]] =
      Encoders.kryo[List[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k rows per group from a scored DataFrame(groupCol, idCol,
    * scoreCol) — aggregator path: one partial-aggregating shuffle of
    * ≤k entries per group per partition. Output matches
    * `row_number over (partition by group order by score desc, id)`
    * ≤ k exactly. */
  def topKPerGroup(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .select(col(groupCol).cast("long").as("_g"),
        col(scoreCol).cast("double").as("_s"), col(idCol).cast("long").as("_i"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAgg(k).toColumn)
      .toDF("_g", "topk")
      .select(col("_g").as(groupCol),
        posexplode(col("topk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e._2").as(idCol),
        col("_e._1").as(scoreCol), (col("_pos") + 1).cast("int").as("rank"))
  }

  /** [[topKPerGroup]] for STRING group keys (strata like lang/source);
    * same bounded-heap partial aggregation, same tie semantics. */
  def topKPerGroupStr(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .select(col(groupCol).cast("string").as("_g"),
        col(scoreCol).cast("double").as("_s"), col(idCol).cast("long").as("_i"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAgg(k).toColumn)
      .toDF("_g", "topk")
      .select(col("_g").as(groupCol),
        posexplode(col("topk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e._2").as(idCol),
        col("_e._1").as(scoreCol), (col("_pos") + 1).cast("int").as("rank"))
  }
}
