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

  /** Test-set decontamination (the GPT-3/PaLM eval-overlap pass): flag
    * every training document that shares at least one word `n`-gram
    * (classically n=13) with any document of the held-out evaluation
    * set. Emits one row per train doc: (id, n_shared_grams,
    * contaminated).
    *
    * Scale shape: both sides shingle map-side; grams travel as 16-byte
    * md5 keys, never as text. The eval gram set is distinct-reduced
    * (partial agg) and the probe is a shuffle-hash equi-join on the
    * gram hash — eval sets are small but corpus-shaped, so no
    * driver-side broadcast. The final flag join is keyed by doc id.
    * Nothing here is ever all-pairs. */
  def contaminationFlags(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame = {
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(array_distinct(Dedup.shinglesAuto(df, textCol, n))).as("_g"))
      .select(col(idCol), md5(col("_g")).as("_gh"))
    val evalGrams = grams(eval).select("_gh").distinct()
    val hits = grams(train)
      .hint("shuffle_hash").join(evalGrams, Seq("_gh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared_grams"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .withColumn("n_shared_grams", coalesce(col("n_shared_grams"), lit(0L)))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Blocklist filter: drop every document containing ANY blocklisted
    * term (domain/slur/boilerplate lists in real pipelines). The term
    * list is by definition the small side — it rides to every executor
    * as a literal array and the filter is a pure map over the token
    * set: zero shuffle, zero join, survives any corpus size. */
  def blocklistFilter(docs: DataFrame, textCol: String,
      terms: Seq[String]): DataFrame = {
    val block = array(terms.map(t => lit(t.toLowerCase)): _*)
    docs.filter(!arrays_overlap(TextFunctions.tokens(lower(col(textCol))), block))
  }

  /** DataFrame-sourced blocklist: gathered to the driver under an
    * explicit size guard (the same gathering a broadcast join performs)
    * and delegated to the literal form — keeps the zero-shuffle map
    * while accepting a table-shaped list. */
  def blocklistFilter(docs: DataFrame, textCol: String,
      blocklist: DataFrame, termCol: String, maxTerms: Int): DataFrame = {
    val terms = blocklist.select(col(termCol).cast("string")).limit(maxTerms + 1)
      .collect().map(_.getString(0)).toSeq
    require(terms.size <= maxTerms,
      s"blocklist exceeds $maxTerms terms; use an anti-join pipeline for corpus-sized lists")
    blocklistFilter(docs, textCol, terms)
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
