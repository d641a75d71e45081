package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Word-level BPE increment: ship or close (VERDICT r19 #5). The
  * char-level trainers (X226/X227) increment because they are pure
  * functions of the word-count dict — a VOCAB-scale mergeable
  * partial. SURVEY documents that the word-level X96 form cannot use
  * that dict (cross-word pairs depend on sequence context), but the
  * claim deserved numbers. This main measures the two quantities that
  * decide whether a word-level increment is worth its store, at three
  * SFs:
  *
  *  1. STATE SIZE. The minimal replayable training state is the
  *     cell-encoded corpus (`state` in `Corpus.bpeMerges`) plus the
  *     running pair-count table: rows(state) = docs and its payload
  *     is the full token stream (Σ tokens), while the pair table is
  *     the DISTINCT-BIGRAM table. If distinct bigrams B grow like
  *     corpus tokens T (no Heaps'-law collapse, unlike the word dict
  *     D), the store is corpus-sized and an "index" of it is just the
  *     corpus again.
  *  2. SAVINGS CEILING. The ONLY work an increment could skip is the
  *     tokenize + round-1 full pair explode over OLD data — every
  *     later round's argmax depends on the union (greedy BPE is not
  *     prefix-stable), and the per-round ±delta scan must read the
  *     UNION cells whatever we persist. Measuring round-1 cost as a
  *     fraction of full training bounds the best-case saving.
  *
  * Prints one line per SF: T, D, B, B/D, round-1 secs, full-train
  * secs (BPE_MERGES=4, the gate config), saving ceiling %.
  * Adjudication lands in PLANS.md ("Round-20: word-level BPE
  * increment — measured negative").
  */
object BpeWordBound {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val docs = graft.core.Tables.documents(spark, d)
      val toks = docs.select(
        explode(graft.functions.TextFunctions.tokens(lower(col("text"))))
          .as("w"))
      val bigrams = docs.select(
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("ts"))
        // guard short docs: sequence(1, 0) steps DOWN to [1, 0] (two
        // out-of-bounds lookups → null bigram rows skewing B), so docs
        // with < 2 tokens must emit an empty array (r20 advisor finding)
        .select(explode(expr(
          "transform(CASE WHEN size(ts) >= 2 THEN sequence(1, size(ts) - 1) " +
            "ELSE array() END, " +
            "i -> concat(ts[i - 1], ' ', ts[i]))")).as("b"))
      val t = toks.count()
      val dw = toks.distinct().count()
      val b = bigrams.distinct().count()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // warm both paths once, then min-of-two
      def round1(): Unit = { bigrams.groupBy(col("b")).count().count(); () }
      def full(): Unit = {
        graft.operators.Corpus.bpeMerges(docs, "doc_id", "text", 4).count()
        ()
      }
      round1(); full()
      val r1 = math.min(time(round1()), time(round1()))
      val ft = math.min(time(full()), time(full()))
      println(f"[bpe-bound] $d tokens=$t distinctWords=$dw " +
        f"distinctBigrams=$b bOverD=${b.toDouble / dw}%.2f " +
        f"round1=$r1%.2fs full=$ft%.2fs savingCeiling=${100 * r1 / ft}%.0f%%")
    }
    spark.stop()
  }
}
