package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** r22 optimization pins: the shared-token-table (`Dedup.tokenBase` +
  * `...FromToks`) forms must be OUTPUT-IDENTICAL to the text forms they
  * replace in the ingest compositions — same fingerprints, same
  * shingle records, same survivor ids, same substring coverage —
  * including the null/empty-text edge rows the text forms normalize.
  */
class TokenBaseSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with exact dups, near-dups, a shared window run, an empty
  // and a null text — every edge the text forms handle
  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "alpha beta gamma delta epsilon zeta eta iota"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 0
    (3L, "totally different words here nothing shared at all"),
    (4L, ""),
    (5L, null.asInstanceOf[String]),
    (6L, "  alpha   beta gamma delta epsilon zeta eta theta  "), // ws-variant dup of 0
    (7L, "alpha beta gamma delta epsilon zeta eta theta extra tail tokens")
  ).toDF("doc_id", "text")

  private lazy val toks = Dedup.tokenBase(docs, "doc_id", "text")

  test("fingerprintOfTokens over tokenBase equals fingerprintMd5 over text") {
    val a = docs.select(col("doc_id"),
      TextFunctions.fingerprintMd5(col("text")).as("fp"))
    val b = toks.select(col("doc_id"),
      TextFunctions.fingerprintOfTokens(col("_t")).as("fp"))
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("nearDupStoreRecordsFromToks equals nearDupStoreRecords") {
    val a = Dedup.nearDupStoreRecords(docs, "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 3)
    val b = Dedup.nearDupStoreRecordsFromToks(toks, "doc_id",
      shingleN = 3, bands = 4, rowsPerBand = 3)
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("incrementalExactDedupFromToks keeps the text form's survivors") {
    val prior = docs.filter(col("doc_id") % 3 === 0)
      .select(TextFunctions.fingerprintMd5(col("text")).as("fp")).distinct()
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val a = Dedup.incrementalExactDedup(batch, prior, "text", "doc_id")
      .select("doc_id", "fp")
    val b = Dedup.incrementalExactDedupFromToks(
      toks.filter(col("doc_id") % 3 =!= 0), prior, "doc_id")
      .select("doc_id", "fp")
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("incrementalNearDupFromToks keeps the text form's survivors and records") {
    val store = Dedup.nearDupStoreRecords(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 3)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val a = Dedup.incrementalNearDup(batch, store, "text", "doc_id",
      threshold = 0.7, shingleN = 3, bands = 4, rowsPerBand = 3)
      .select("doc_id", "shingles", "sig", "band_keys")
    val b = Dedup.incrementalNearDupFromToks(
      toks.filter(col("doc_id") % 3 =!= 0), store, "doc_id",
      threshold = 0.7, shingleN = 3, bands = 4, rowsPerBand = 3)
      .select("doc_id", "shingles", "sig", "band_keys")
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("substring FromToks forms equal the text forms") {
    val storeSlice = docs.filter(col("doc_id") % 3 === 0)
    val storeToks = toks.filter(col("doc_id") % 3 === 0)
    val ga = Dedup.substringStoreRecords(storeSlice, "doc_id", "text", L = 4)
    val gb = Dedup.substringStoreRecordsFromToks(storeToks, "doc_id", L = 4)
    assert(ga.collect().toSet == gb.collect().toSet)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val a = Dedup.incrementalSubstringDedup(batch, ga, "doc_id", "text", L = 4)
    val b = Dedup.incrementalSubstringDedupFromToks(
      toks.filter(col("doc_id") % 3 =!= 0), ga, "doc_id", L = 4)
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("softDedupFromToks equals softDedup") {
    val a = Dedup.softDedup(docs, "doc_id", "text", threshold = 0.7,
      shingleN = 3, bands = 4, rowsPerBand = 3)
    val b = Dedup.softDedupFromToks(toks, "doc_id", threshold = 0.7,
      shingleN = 3, bands = 4, rowsPerBand = 3)
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("spreadIfNarrow leaves a wide union of narrow subtrees alone") {
    val target = spark.sparkContext.defaultParallelism
    val wideUnion = spark.range(0, 500, 1, target * 2).toDF("id")
      .unionByName(spark.range(500, 1000, 1, target * 2).toDF("id"))
    val out = graft.core.Tables.spreadIfNarrow(wideUnion)
    // pre-r22 a union always fell back to the unconditional round-robin
    // (REDUCING parallelism to `target`); now it is probed like a scan
    assert(out.rdd.getNumPartitions == target * 4)
    assert(out eq wideUnion)
  }
}
