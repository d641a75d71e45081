package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, over a
  * `documents(doc_id, text, ...)` table. Scale design notes:
  *
  *  - Exact dedup: one hash-shuffle on the content fingerprint; the
  *    fingerprint (16-byte md5) — not the document text — is the
  *    shuffle key, so shuffle volume is O(rows·16B), not O(corpus).
  *  - MinHash/LSH: the classic shingle → minhash signature → band →
  *    bucket-join pipeline. Only documents sharing a band bucket are
  *    pair-compared, so candidate generation is a groupBy on band
  *    values (skew-guarded by capping giant buckets) instead of an
  *    O(n²) cross join. At 100 TB this is the only join shape that
  *    survives: everything shuffles by short hash keys.
  *  - SimHash: per-document 60-bit signature; near-dup candidates
  *    share one of four 15-bit sub-bands (Hamming ≤ 3 guarantee via
  *    pigeonhole), verified by exact Hamming distance (`bit_count`).
  *  - Embedding near-dup: cosine over LSH sign-buckets, see
  *    Similarity.
  *
  * All hashes are md5-derived (portable, oracle-verifiable) — see
  * TextFunctions.hexHash60.
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per normalized-content
    * fingerprint. One shuffle, deterministic survivor. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol).asc)
    df.withColumn("_fp", fingerprintMd5(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_fp")
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum
    * md5(seed:shingle) hex string over the document's shingles.
    * Min-over-strings on hex is order-isomorphic to min over the
    * underlying 128-bit integers, and portable across engines.
    * Returns array<string> of length numHashes (null-free; docs with
    * no shingles get "z"-sentinels that only collide with each other).
    */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleN)
    val sig = (0 until numHashes).map { seed =>
      coalesce(
        array_min(transform(sh,
          s => md5(concat(lit(seed.toString), lit(":"), s).cast("binary")))),
        lit("zz_empty"))
    }
    array(sig: _*)
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `rowsPerBand`, bucket on (bandIdx, concat(band)), emit distinct
    * (id1 < id2) pairs sharing any bucket. The band explode costs
    * rows×bands; the self-join shuffles only (bandKey, id) pairs. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleN, numHashes).as("_sig"))
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "|"))))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id1"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** MinHash near-dup pairs, verified: LSH candidates filtered by
    * exact n-gram Jaccard ≥ threshold. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, shingleN, bands, rowsPerBand)
    val sh = df.select(col(idCol).as("_jid"),
      array_distinct(shingles(col(textCol), shingleN)).as("_sh"))
    cands
      .join(sh.withColumnRenamed("_jid", "id1").withColumnRenamed("_sh", "_sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("_jid", "id2").withColumnRenamed("_sh", "_sh2"), Seq("id2"))
      .withColumn("jaccard", jaccardArr(col("_sh1"), col("_sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard over two pre-distinct arrays. */
  private def jaccardArr(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(0.0)
  }

  /** All-pairs n-gram Jaccard ≥ threshold via an inverted shingle
    * index (join on shared shingle, count hits per pair, derive
    * |union| = |A|+|B|−hits). No cross join: only pairs sharing ≥1
    * shingle are materialized — the standard "candidate by common
    * token" plan that scales with corpus overlap, not corpus².
    * Hot shingles are capped (shingles occurring in > maxDocFreq docs
    * are dropped, a standard stopword-shingle guard at scale;
    * with the default the behavior is exact). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("_sh"))
      .withColumn("_size", size(col("_sh")))
    val inv = sh.select(col("id"), col("_size"), explode(col("_sh")).as("shingle"))
    val invF =
      if (maxDocFreq == Long.MaxValue) inv
      else {
        val hot = inv.groupBy("shingle").count().filter(col("count") > maxDocFreq)
        inv.join(broadcast(hot.select("shingle")), Seq("shingle"), "left_anti")
      }
    val a = invF.select(col("shingle"), col("id").as("id1"), col("_size").as("_s1"))
    val b = invF.select(col("shingle"), col("id").as("id2"), col("_size").as("_s2"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("_s1"), col("_s2"))
      .agg(count(lit(1)).as("_inter"))
      .withColumn("jaccard",
        col("_inter").cast("double") /
          (col("_s1") + col("_s2") - col("_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit SimHash over the token stream: bit b of the signature is
    * set iff Σ_tokens (2·bit_b(hash(token)) − 1) > 0. One pass to hash
    * tokens, then 60 integer reductions over the (small) hash array —
    * all inside whole-stage codegen. */
  def simhash60(text: Column): Column = {
    val hs = transform(tokens(lower(text)), t => hexHash60Tok(t))
    val bitCols = transform(sequence(lit(0), lit(59)), b => {
      val votes = aggregate(hs, lit(0),
        (acc, h) => acc +
          when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    aggregate(bitCols, lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  private def hexHash60Tok(t: Column): Column =
    conv(substring(md5(concat(lit("sh:"), t).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** SimHash near-dup pairs with Hamming ≤ maxDist, candidates via
    * 4-way band pigeonhole (any pair within Hamming 3 shares at least
    * one intact 15-bit quarter). Verified with exact
    * `bit_count(xor)`. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash60(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sig"), q * 15).bitwiseAND(lit((1L << 15) - 1))): _*)))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id1"), col("sig").as("_sig1"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id2"), col("sig").as("_sig2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        call_function("bit_count", col("_sig1").bitwiseXOR(col("_sig2")))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
