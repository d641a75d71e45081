package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level term statistics for training-data pipelines: TF-IDF
  * term scoring and vocabulary building. Declarative two-shuffle
  * plans — tokenize/explode is an embarrassingly parallel map, the
  * aggregations are partial-agg shuffles on short keys (term,
  * (doc, term)), and the document-frequency table broadcasts (vocab ≪
  * corpus; natural-language vocabularies grow ~O(corpus^0.5), Heaps'
  * law, so the broadcast holds at 100 TB).
  */
object Corpus {

  /** Top-`k` TF-IDF terms per document: tf = in-doc term count, idf =
    * ln(N / df) (df ≥ 1 always, no smoothing needed), score rounded to
    * 6dp BEFORE ranking so the (score desc, term asc) order — and
    * therefore the emitted rank — is identical in any engine that
    * computes the same doubles.
    *
    * The per-document ranking window is scale-safe: its group size is
    * bounded by a single document's distinct-term count (document
    * length), never by corpus size. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, term): df(term) is a plain
    // count — no count(distinct) double-shuffle needed
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Corpus vocabulary: the `topN` most frequent terms with counts and
    * a deterministic dense ordering (count desc, term asc). The global
    * top-N plans as TakeOrderedAndProject over the partially-aggregated
    * counts — per-partition heaps, no full sort — and the rank window
    * runs on ≤ topN rows (bounded regardless of corpus size). */
  def vocabulary(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    counts.orderBy(col("n").desc, col("term").asc).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("term").asc)))
  }
}
