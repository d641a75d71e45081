package graft.queries


import graft.core.Caches.TrackedPersist

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.operators.{Corpus, Dedup, Multimodal, Similarity}
import graft.streaming.EventsStreaming

/** As-of/skew joins and event-time streaming gates: windows, sessions, stream-stream joins, store-maintenance streams.
  *
  * Part of [[Extensions]]'s mixin chain (see [[ExtAllGates]]): the
  * chain's linearization order IS the val-initialization order the
  * original single-object layout had, so the "a val referencing a
  * later val silently interpolates null" contract is unchanged --
  * forward references stay `lazy val`, exactly as before the split.
  * Members are `private[queries]` where the single object had
  * `private` (trait-private would hide them from sibling traits);
  * nothing else changed in the move.
  */
trait ExtStreamGates { this: ExtAllGates =>
  // -------------------- as-of / skew joins --------------------

  /** As-of join over events: each purchase picks up the user's most
    * recent signup at-or-before it (event_id as the precision-safe
    * ordering key). Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"))
    graft.operators.ScaleOps.asOfJoin(purchases, signups,
      Seq("user_id"), "event_id", "event_id",
      Map("event_id" -> "signup_id"))
      .select(col("user_id"), col("event_id"), col("value"), col("signup_id"))
  }

  val asofJoinSql: String =
    "SELECT l.user_id, l.event_id, l.value, r.event_id AS signup_id " +
      "FROM (SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase') l " +
      "ASOF LEFT JOIN (SELECT user_id, event_id FROM events WHERE event_type = 'signup') r " +
      "ON l.user_id = r.user_id AND l.event_id >= r.event_id"

  /** As-of join with tolerance (X15b, pandas merge_asof(tolerance)):
    * backward attribution capped at a max id-gap of 500 — signups too
    * far in the past don't attribute; zero extra shuffles over the
    * plain as-of. Oracle = native ASOF JOIN + the same gap CASE. */
  val asofTolerance: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"))
    graft.operators.ScaleOps.asOfJoinTolerance(purchases, signups,
      Seq("user_id"), "event_id", "event_id",
      Map("event_id" -> "signup_id"), tolerance = 500L)
      .select(col("user_id"), col("event_id"), col("value"),
        coalesce(col("signup_id"), lit(-1L)).as("signup_id"))
  }

  val asofToleranceSql: String =
    "SELECT l.user_id, l.event_id, l.value, " +
      "coalesce(CASE WHEN l.event_id - r.event_id <= 500 THEN r.event_id END, -1) AS signup_id " +
      "FROM (SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase') l " +
      "ASOF LEFT JOIN (SELECT user_id, event_id FROM events WHERE event_type = 'signup') r " +
      "ON l.user_id = r.user_id AND l.event_id >= r.event_id"

  /** Forward as-of join (polars strategy='forward'): each purchase
    * attributed to the NEXT signup at-or-after it — same union +
    * carry window as the backward form, descending order. */
  val asofForward: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"))
    graft.operators.ScaleOps.asOfJoin(purchases, signups,
      Seq("user_id"), "event_id", "event_id",
      Map("event_id" -> "next_signup_id"), forward = true)
      .select(col("user_id"), col("event_id"), col("value"),
        col("next_signup_id"))
  }

  val asofForwardSql: String =
    "SELECT l.user_id, l.event_id, l.value, r.event_id AS next_signup_id " +
      "FROM (SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase') l " +
      "ASOF LEFT JOIN (SELECT user_id, event_id FROM events WHERE event_type = 'signup') r " +
      "ON l.user_id = r.user_id AND l.event_id <= r.event_id"

  /** Deterministic train/holdout split by content-id hash — the split
    * assignment is a pure md5 function of the id, so the oracle
    * reproduces it exactly. */
  val hashSplit: Q = (s, d) =>
    graft.operators.ScaleOps.hashSplit(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", holdoutPct = 10)

  val hashSplitSql: String =
    "SELECT doc_id, CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 10 " +
      "THEN 'holdout' ELSE 'train' END AS split FROM documents"

  /** Two-pass heavy hitters (CMS candidates + exact rescore): output
    * is exact, so the oracle is the plain GROUP BY/HAVING — the sketch
    * only narrows pass-2 work and can never change the answer. */
  val heavyHitters: Q = (s, d) =>
    graft.operators.ScaleOps.heavyHitters(
      Tables.events(s, d).select(col("user_id")), "user_id", minCount = 8L)

  val heavyHittersSql: String =
    "SELECT user_id, count(*) AS n FROM events GROUP BY user_id HAVING count(*) >= 8"

  /** Bloom-pruned fact-dim join — result provably identical to the
    * plain join (no false negatives), which IS the oracle. */
  val bloomJoin: Q = (s, d) =>
    graft.operators.ScaleOps.bloomPrunedJoin(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").as("s_suppkey")),
      Tables.supplier(s, d).filter(col("s_nationkey") < 5)
        .select(col("s_suppkey"), col("s_name")),
      "s_suppkey", expectedDimKeys = 100000L)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))

  val bloomJoinSql: String =
    "SELECT l_orderkey, l_linenumber, s_name FROM lineitem " +
      "JOIN supplier ON l_suppkey = s_suppkey WHERE s_nationkey < 5"

  /** Skew-salted fact-dim join — result provably identical to the
    * plain join (the oracle IS the plain join). */
  val saltedJoin: Q = (s, d) =>
    graft.operators.ScaleOps.saltedJoin(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").as("p_partkey")),
      Tables.part(s, d).select(col("p_partkey"), col("p_name")),
      Seq("p_partkey"), saltBuckets = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"))

  val saltedJoinSql: String =
    "SELECT l_orderkey, l_linenumber, p_name FROM lineitem JOIN part ON l_partkey = p_partkey"

  // -------------------- event-time windows --------------------

  val windowAgg: Q = (s, d) =>
    EventsStreaming.windowedAggBatch(Tables.events(s, d))
      .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
        col("event_type"), col("n"), col("total"))

  val windowAggSql: String =
    "SELECT CAST(floor(epoch(time_bucket(INTERVAL '5 minutes', ts))) AS BIGINT) AS win_start_epoch, " +
      "event_type, COUNT(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total " +
      "FROM events GROUP BY 1, 2"

  /** ACTUAL Structured Streaming run (readStream → watermark →
    * windowed agg → memory sink, Trigger.AvailableNow to completion);
    * the oracle is the batch SQL — stream-equals-batch is the check. */
  val streamWindowAgg: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-q")
    // glob, not bare file: the file stream source requires a directory
    // basePath and a glob keeps it at the parent dir
    val q = EventsStreaming.windowedAgg(
      EventsStreaming.readDriverEventsStream(s, s"$d/events.parque[t]"))
      .writeStream.format("memory").queryName("graft_stream_agg")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_agg")
      .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
        col("event_type"), col("n"), col("total"))
  }

  /** Checkpoint scratch for the gate's run-to-completion streams: these
    * checkpoints are throwaway (each run starts fresh), so durability
    * buys nothing — put them on tmpfs when available and skip the
    * disk fsync per offset/commit/state-delta file that a disk-backed
    * java.io.tmpdir pays. A real deployment would point this at
    * durable shared storage instead. */
  /** Declared schema for streaming reads of the driver's documents
    * table (streaming file sources cannot infer; one definition so a
    * column change cannot silently null out a stale copy). */
  private[queries] val docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** Best-effort recursive delete of a throwaway directory (temp
    * stores, checkpoints) — repeated gate/bench runs must not
    * accumulate them. */
  private[queries] def deleteRecursively(dir: String): Unit =
    scala.util.Try {
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }

  private[queries] def streamCkptDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }

  /** Run a streaming query to completion, then delete its throwaway
    * checkpoint — the memory-sink table outlives the state files, and
    * repeated gate/bench runs must not accumulate dead checkpoints on
    * tmpfs (that's RAM). */
  private[queries] def runStreamThenCleanCkpt(
      q: org.apache.spark.sql.streaming.StreamingQuery, ckpt: String): Unit = {
    try q.awaitTermination()
    finally deleteRecursively(ckpt)
  }

  /** Streaming runs size their state to the data, not the session
    * default: a fresh checkpoint pins the state-store partition count
    * at start, and 32 near-empty state partitions cost ~4× the
    * wall-clock of 8 right-sized ones per micro-batch (provider files
    * + commit log per partition). Results are partition-independent;
    * the session conf is restored afterwards. */
  private[queries] def withStreamShuffle[T](s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }

  /** X21 as a driver-gate query: ACTUAL streaming dedup run
    * (readStream → fingerprint → watermark + dropDuplicates → memory
    * sink, AvailableNow to completion). Output is the SET of surviving
    * fingerprints — order-independent, so it hashes identically no
    * matter which duplicate row won inside the state store. */
  val streamDedup: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sd")
    // +1: a row at epoch 0 would satisfy the initial late-row predicate
    // (ts <= watermark=0) and be silently dropped
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .select(timestamp_micros((col("doc_id") + 1) * 1000000L).as("ts"),
        fingerprintMd5(col("text")).as("fp"))
    val q = EventsStreaming.streamingDedup(src, "ts", "fp")
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_dedup").select(col("fp"))
  }

  val streamDedupSql: String =
    s"SELECT DISTINCT md5($duckNormText) AS fp FROM documents"

  /** Streaming incremental dedup (X122): the doc_id % 3 == 0 slice is
    * the already-ingested store (fingerprints only, STATIC side); the
    * rest streams through the stream-static anti join + watermarked
    * dropDuplicates. Oracle = distinct fresh fingerprints not in the
    * store. */
  val streamIncrDedup: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sid")
    // % 5 overlap for the same reason as incrementalDedup: without it
    // the corpus's all-distinct texts would make the anti-join a no-op
    val prior = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0)
      .select(fingerprintMd5(col("text")).as("fp")).distinct()
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .filter(col("doc_id") % 3 =!= 0)
      .select(timestamp_micros((col("doc_id") + 1) * 1000000L).as("ts"),
        fingerprintMd5(col("text")).as("fp"))
    val q = EventsStreaming.streamingIncrementalDedup(src, prior, "ts", "fp")
      .writeStream.format("memory").queryName("graft_stream_incr_dedup")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_incr_dedup").select(col("fp"))
  }

  val streamIncrDedupSql: String =
    s"WITH f AS (SELECT doc_id, md5($duckNormText) AS fp FROM documents), " +
      "prior AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0 OR doc_id % 5 = 0) " +
      "SELECT DISTINCT fp FROM f WHERE doc_id % 3 <> 0 " +
      "AND fp NOT IN (SELECT fp FROM prior)"

  /** Streaming incremental EXACT dedup, micro-batch form (X145): the
    * q_incremental_dedup split run through the REAL foreachBatch
    * composition — the store bootstraps to a batch=-1 partition, the
    * rest streams to AvailableNow completion, and each batch's Bloom
    * is rebuilt from the store (zero re-emit window, unlike the DSL
    * form's stream-start snapshot). Single-file source → one
    * micro-batch, so the survivor set equals the batch increment's
    * and the oracle is reused verbatim; the arbitrary-gap hand-off is
    * pinned by StreamingSpec. */
  val streamIncrExact: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sie")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-fpstore").toString
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0)
      .select(TextFunctions.fingerprintMd5(col("text")).as("fp")).distinct()
      .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"), col("source"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = EventsStreaming.streamingIncrementalExactDedup(
      src, storeDir, "text", "doc_id") { (sv, _) =>
      buf ++= sv.select(col("doc_id"), col("source"), col("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(storeDir)
    import s.implicits._
    buf.toSeq.toDF("doc_id", "source", "fp")
  }

  /** Streaming store COMPACTION (X155): the increment family's
    * `batch=<id>` stores grow one partition per micro-batch forever —
    * [[EventsStreaming.compactStore]] merges an append-layout store
    * into one bootstrap partition (read-equivalent by construction;
    * the snapshot layout keeps only the newest table). This gate row
    * drives it end-to-end: three history tranches land as three batch
    * partitions, compaction collapses them (the query FAILS LOUD if
    * more than the bootstrap partition survives), and the exact-dedup
    * increment then runs against the compacted store — any row lost
    * or duplicated by compaction moves the survivor set and flips the
    * hash. Oracle = the increment against the union of the tranches,
    * which IS the read-equivalence claim in SQL form. */
  val streamCompaction: Q = (s, d) => {
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-cmpstore").toString
    try {
      val f = Tables.documents(s, d)
        .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      // three disjoint history tranches, three batch partitions
      f.filter(col("doc_id") % 3 === 0).select(col("fp")).distinct()
        .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
      f.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0)
        .select(col("fp")).distinct()
        .write.mode("overwrite").parquet(s"$storeDir/batch=0")
      f.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 =!= 0 &&
          col("doc_id") % 7 === 0)
        .select(col("fp")).distinct()
        .write.mode("overwrite").parquet(s"$storeDir/batch=1")
      graft.streaming.EventsStreaming.compactStore(s, storeDir,
        snapshotLayout = false)
      val store = s.read.option("basePath", storeDir).parquet(storeDir)
      val parts = store.select(col("batch").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
      require(parts == Seq(-1L),
        s"compaction left partitions $parts — expected only batch=-1")
      val batch = Tables.documents(s, d)
        .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 =!= 0 &&
          col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"), col("source"))
      // result computed EAGERLY (localCheckpoint) so the temp store can
      // be deleted before the driver consumes the frame
      graft.operators.Dedup.incrementalExactDedup(
        batch, store.drop("batch"), "text", "doc_id")
        .select(col("doc_id"), col("source"), col("fp"))
        .localCheckpoint()
    } finally deleteRecursively(storeDir)
  }

  val streamCompactionSql: String =
    s"WITH f AS (SELECT doc_id, md5($duckNormText) AS fp FROM documents), " +
      "prior AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0 OR doc_id % 5 = 0 OR doc_id % 7 = 0) " +
      "SELECT n.doc_id, d.source, n.fp FROM (" +
      "SELECT doc_id, fp, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM (" +
      "SELECT doc_id, fp FROM f WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0 AND doc_id % 7 <> 0) x " +
      "WHERE fp NOT IN (SELECT fp FROM prior)) n " +
      "JOIN documents d ON d.doc_id = n.doc_id WHERE n.rn = 1"

  /** Streaming incremental SEMANTIC dedup (X146): the
    * q_incremental_semdedup split through the real foreachBatch
    * composition — centroids trained once on the %3 == 0 slice
    * (frozen), the store bootstraps to batch=-1, the rest streams to
    * AvailableNow completion. Single-file source → one micro-batch,
    * so the survivor set equals the batch increment's and the oracle
    * is reused verbatim. */
  val streamIncrSemantic: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sis")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-semstore").toString
    val emb = Tables.embeddings(s, d)
    val storeSlice = emb.filter(col("vec_id") % 3 === 0)
    val cents = sharedSemStoreCents(s, d)
    Similarity.semanticStoreRecords(storeSlice, "vec_id", "embedding", cents)
      .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
    val embSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType)))
    val src = s.readStream.schema(embSchema).parquet(s"$d/embeddings.parque[t]")
      .filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = EventsStreaming.streamingIncrementalSemanticDedup(
      src, storeDir, cents, threshold = SEMDEDUP_T) { (sv, _) =>
      buf ++= sv.select(col("id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(storeDir)
    import s.implicits._
    buf.toSeq.toDF("vec_id", "cell")
  }

  /** Streaming incremental NEAR-dup (X134): the q_incremental_neardup
    * split run through the REAL foreachBatch composition — the
    * %3 == 0 slice's index records bootstrap a store directory, the
    * rest streams to AvailableNow completion, survivors flow through
    * the sink callback and their store records are appended per batch.
    * Single-file source → one micro-batch, so the survivor set equals
    * the batch increment's and the oracle reuses its CTE chain; the
    * multi-batch store hand-off is pinned by StreamingSpec with an
    * explicit two-run checkpoint chain. */
  val streamIncrNearDup: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sind")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-ndstore").toString
    // bootstrap under its own batch partition (the retry-idempotent
    // layout: micro-batches own batch=<id> dirs; discovery rejects a
    // flat-plus-partitioned mix)
    Dedup.nearDupStoreRecords(
      Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
      "doc_id", "text",
      shingleN = 3, bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB)
      .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"), col("source"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = EventsStreaming.streamingIncrementalNearDup(src, storeDir,
      "text", "doc_id", threshold = 0.7,
      shingleN = 3, bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB) {
      (survivors, _) =>
        buf ++= survivors.select(col("doc_id"), col("source"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(storeDir)
    import s.implicits._
    buf.toSeq.toDF("doc_id", "source")
  }

  val streamIncrNearDupSql: String =
    incrementalNearDupCtes +
      "SELECT d.doc_id, d.source FROM documents d " +
      "WHERE d.doc_id % 3 <> 0 AND d.doc_id NOT IN (SELECT bid FROM dups)"

  /** Streaming incremental SUBSTRING dedup (X147): the
    * q_incremental_substring split run through the real foreachBatch
    * composition — the %3 == 0 slice's distinct window hashes
    * bootstrap the store under batch=-1, the rest streams to
    * AvailableNow completion, each batch's coverage result flows
    * through the sink and its ORIGINAL windows append per batch
    * (X132's store contract). Single-file source → one micro-batch,
    * so the result equals the batch increment's and the oracle is
    * reused verbatim; the multi-batch hand-off, retry idempotence and
    * checkpoint-lineage guard are pinned by StreamingSpec. */
  val streamIncrSubstring: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sisub")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-substore").toString
    Dedup.substringStoreRecords(
      Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
      "doc_id", "text", L = SUBSTR_L)
      .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, String)]()
    val q = EventsStreaming.streamingIncrementalSubstringDedup(
      src, storeDir, "text", "doc_id", L = SUBSTR_L) { (sv, _) =>
      buf ++= sv.select(col("id"), col("n_tokens"), col("n_kept"), col("kept_md5"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(storeDir)
    import s.implicits._
    buf.toSeq.toDF("doc_id", "n_tokens", "n_kept", "kept_md5")
  }

  val streamIncrSubstringSql: String = incrementalSubstringSql

  /** Always-on composed ingestion, quartet form (X156): the
    * q_ingest_quartet split through the real foreachBatch composition
    * — all four stores bootstrap from the %3 == 0 slice under
    * batch=-1 (fingerprints include the %5 overlap, exactly X139's
    * priorFps), the frozen quantizer trains once on the store slice,
    * and the rest streams to AvailableNow completion through
    * [[EventsStreaming.streamingIngestQuartet]]. Single-file source →
    * one micro-batch, so the final survivor set equals the batch
    * quartet's and the oracle is reused verbatim; the cross-batch
    * hand-off (near-dup of a batch-1 survivor + substring-dup of
    * batch-2 windows both dropping in batch 3) is pinned by
    * StreamingSpec. */
  val streamIngestQuartet: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-siq")
    val base =
      java.nio.file.Files.createTempDirectory("graft-quartet").toString
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    // r22 (guide §1.2): one persisted token table over the bootstrap
    // slice feeds all three text-store builders — the pre-r22 shape
    // tokenized the store slice once per store
    val toksBoot = Dedup.tokenBase(
      docs.filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0),
      "doc_id", "text").localCheckpoint()
    val storeToks = toksBoot.filter(col("doc_id") % 3 === 0)
    val embStore = emb.filter(col("vec_id") % 3 === 0)
    val cents = sharedSemStoreCents(s, d)
    // r22 (guide §2.6): the four bootstrap stores are independent
    // writes over materialized inputs — run them concurrently
    graft.core.Caches.runConcurrently[Unit](Seq(
      () => toksBoot
        .select(TextFunctions.fingerprintOfTokens(col("_t")).as("fp")).distinct()
        .write.mode("overwrite").parquet(s"$base/exact/batch=-1"),
      () => Dedup.nearDupStoreRecordsFromToks(storeToks, "doc_id",
          shingleN = 3, bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB)
        .write.mode("overwrite").parquet(s"$base/neardup/batch=-1"),
      () => Dedup.substringStoreRecordsFromToks(storeToks, "doc_id",
          L = SUBSTR_L)
        .write.mode("overwrite").parquet(s"$base/substring/batch=-1"),
      () => Similarity.semanticStoreRecords(embStore, "vec_id", "embedding",
          cents)
        .write.mode("overwrite").parquet(s"$base/semantic/batch=-1")))
    val src = s.readStream.schema(docsSchema).parquet(s"$d/documents.parque[t]")
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = EventsStreaming.streamingIngestQuartet(src, base, emb, cents,
      "text", "doc_id", threshold = 0.7, shingleN = 3,
      bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB, L = SUBSTR_L,
      semThreshold = SEMDEDUP_T) { (out, _) =>
      buf ++= out.select(col("doc_id"), col("cell"), col("n_kept"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(base)
    import s.implicits._
    buf.toSeq.toDF("doc_id", "cell", "n_kept")
  }

  // lazy: ingestQuartetSql is itself lazy and declared in another
  // section of this object
  lazy val streamIngestQuartetSql: String = ingestQuartetSql

  /** Streaming incremental cluster maintenance (X152): the
    * q_incremental_clusters split through the real foreachBatch
    * composition — history pairs' CC labels bootstrap the snapshot
    * store under batch=-1, the batch pairs stream to AvailableNow
    * completion, and each micro-batch folds its pairs in by graph
    * contraction and writes the full updated label table as its own
    * snapshot. Single-file source → one micro-batch, so the final
    * table equals the batch increment's and the oracle (the exact
    * recursive-CTE closure over ALL pairs) is reused verbatim; the
    * multi-batch snapshot chain, retry replay and lineage guard are
    * pinned by StreamingSpec. */
  val streamIncrClusters: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-sic")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft-lblstore").toString
    val pairsDir =
      java.nio.file.Files.createTempDirectory("graft-pairsrc").toString
    val pairs = graft.core.Caches.persistTracked(
      Dedup.minhashNearDupPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.7, shingleN = 3,
        bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB)
        .select(col("id1"), col("id2")))
    Dedup.connectedComponents(
      pairs.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0),
      "id1", "id2")
      .write.mode("overwrite").parquet(s"$storeDir/batch=-1")
    pairs.filter(col("id1") % 3 =!= 0 || col("id2") % 3 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(pairsDir)
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id1",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id2",
        org.apache.spark.sql.types.LongType)))
    val src = s.readStream.schema(pairSchema).parquet(pairsDir)
    // each batch's sink payload is the COMPLETE updated table — keep
    // the last one
    var result: Array[(Long, Long)] = Array.empty
    val q = EventsStreaming.streamingIncrementalClusters(src, storeDir) {
      (upd, _) =>
        result = upd.select(col("id"), col("cluster_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally { deleteRecursively(storeDir); deleteRecursively(pairsDir) }
    import s.implicits._
    result.toSeq.toDF("doc_id", "cluster_id")
  }

  // lazy: incrementalClustersSql is declared later in this object —
  // an eager val here would silently interpolate null
  lazy val streamIncrClustersSql: String = incrementalClustersSql

  /** Streaming canonical maintenance (X197): the q_stream_incr_clusters
    * staging with BOTH snapshot stores — bootstrap labels + picks from
    * the %3==0 pair slice at batch=-1, the remaining pairs streamed
    * through one checkpoint, each batch re-electing picks for touched
    * clusters only; output is the final pick table, which must equal
    * the full argmax over all pairs (the oracle). */
  val streamCanonical: Q = (s, d) => withStreamShuffle(s, 8) {
    val ckpt = streamCkptDir("graft-ckpt-scan")
    val lblDir =
      java.nio.file.Files.createTempDirectory("graft-lblstore2").toString
    val pickDir =
      java.nio.file.Files.createTempDirectory("graft-pickstore").toString
    val pairsDir =
      java.nio.file.Files.createTempDirectory("graft-pairsrc2").toString
    val docs = Tables.documents(s, d)
    val scores = docs.select(col("doc_id"), col("n_chars"))
    val pairs = graft.core.Caches.persistTracked(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        threshold = 0.7, shingleN = 3,
        bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB)
        .select(col("id1"), col("id2")))
    val bootLabels = graft.core.Caches.persistTracked(
      Dedup.connectedComponents(
        pairs.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0),
        "id1", "id2"))
    // r22 (guide §2.6): three independent bootstrap writes — concurrent
    graft.core.Caches.runConcurrently[Unit](Seq(
      () => bootLabels.write.mode("overwrite").parquet(s"$lblDir/batch=-1"),
      () => Dedup.canonicalByScore(bootLabels, scores, "doc_id", "n_chars")
        .filter(col("is_canonical"))
        .select(col("cluster_id"), col("id").as("canonical_id"), col("score"))
        .write.mode("overwrite").parquet(s"$pickDir/batch=-1"),
      () => pairs.filter(col("id1") % 3 =!= 0 || col("id2") % 3 =!= 0)
        .coalesce(1).write.mode("overwrite").parquet(pairsDir)))
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id1",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id2",
        org.apache.spark.sql.types.LongType)))
    val src = s.readStream.schema(pairSchema).parquet(pairsDir)
    var result: Array[(Long, Long, Long)] = Array.empty
    val q = EventsStreaming.streamingCanonicalMaintenance(src, lblDir,
      pickDir, scores, "doc_id", "n_chars") { (upd, _) =>
      result = upd.select(col("cluster_id"), col("canonical_id"), col("score"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally {
      deleteRecursively(lblDir); deleteRecursively(pickDir)
      deleteRecursively(pairsDir)
    }
    import s.implicits._
    result.toSeq.toDF("cluster_id", "canonical_id", "score")
  }

  lazy val streamCanonicalSql: String = incrementalCanonicalSql

  /** Streaming soft-dedup weight maintenance (X217): bootstrap the
    * weight snapshot store from the %3==0 pair slice, stream every
    * pair touching a non-store doc PLUS a self-loop per pair-free
    * batch doc (the singleton spine), read back the final snapshot.
    * Oracle = q_soft_dedup's full recompute verbatim — the equality
    * the snapshot store guarantees after any batch. */
  val streamSoftDedup: Q = (s, d) => withStreamShuffle(s, 8) {
    import s.implicits._
    val ckpt = streamCkptDir("graft-ckpt-softw")
    val wDir =
      java.nio.file.Files.createTempDirectory("graft-softwstore").toString
    val pairsDir =
      java.nio.file.Files.createTempDirectory("graft-softwsrc").toString
    val docs = Tables.documents(s, d)
    val pairs = graft.core.Caches.persistTracked(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        threshold = 0.7, shingleN = 3,
        bands = MINHASH_BANDS, rowsPerBand = MINHASH_RPB)
        .select(col("id1"), col("id2")))
    // r22 (guide §2.6): the weight-store bootstrap and the pair-source
    // dump are independent writes — run both concurrently. The
    // bootstrap is the operator's spec-pinned empty-store degenerate
    // case (empty store ≡ the batch pass over the %3==0 slice), so it
    // runs the batch tail over the already-mined pairs instead of the
    // increment machinery against an empty frame. The stream side:
    // cross/batch pairs + a self-loop per batch doc (so a pair-free
    // doc still enters the spine).
    val bootPlan = Dedup.softDedupFromPairs(
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id").as("id")),
      "id", pairs.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0))
    graft.core.Caches.runConcurrently[Unit](Seq(
      () => bootPlan.write.mode("overwrite").parquet(s"$wDir/batch=-1"),
      () => pairs.filter(col("id1") % 3 =!= 0 || col("id2") % 3 =!= 0)
        .unionByName(docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id").as("id1"), col("doc_id").as("id2")))
        .coalesce(1).write.mode("overwrite").parquet(pairsDir)))
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id1",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id2",
        org.apache.spark.sql.types.LongType)))
    var result: Array[(Long, Long, Long, Long, Boolean)] = Array.empty
    val q = EventsStreaming.streamingSoftDedupMaintenance(
      s.readStream.schema(pairSchema).parquet(pairsDir), wDir) { (upd, _) =>
      result = upd
        .select(col("id"), col("cluster_id"), col("cluster_size"),
          col("weight_bp"), col("keep"))
        .as[(Long, Long, Long, Long, Boolean)](
          org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long, Boolean)])
        .collect()
    }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally {
      deleteRecursively(wDir); deleteRecursively(pairsDir)
    }
    result.toSeq
      .toDF("doc_id", "cluster_id", "cluster_size", "weight_bp", "keep")
  }

  lazy val streamSoftDedupSql: String = softDedupSql

  /** Streaming PCA training-state maintenance (X221): bootstrap the
    * moment store from the %3==0 tranche, stream the other two as
    * real micro-batches, train from the folded store. The oracle
    * trains FROM SCRATCH on the full corpus — bit-equality is the
    * moment algebra. */
  val streamPca: Q = (s, d) => withStreamShuffle(s, 8) {
    import s.implicits._
    val ckpt = streamCkptDir("graft-ckpt-pcam")
    val mDir =
      java.nio.file.Files.createTempDirectory("graft-pcamstore").toString
    val srcDir =
      java.nio.file.Files.createTempDirectory("graft-pcamsrc").toString
    val emb = graft.core.Caches.persistTracked(Tables.embeddings(s, d))
    graft.operators.Similarity.pcaMomentRecords(
      emb.filter(col("vec_id") % 3 === 0), "embedding", EMB_DIMS)
      .write.mode("overwrite").parquet(s"$mDir/batch=-1")
    emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val q = EventsStreaming.streamingPcaMoments(
      s.readStream.schema(schema).parquet(srcDir),
      mDir, "embedding", EMB_DIMS) { (_, _) => () }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try runStreamThenCleanCkpt(q, ckpt)
    finally deleteRecursively(srcDir)
    val comps =
      try graft.operators.Similarity.pcaComponentsFromMoments(
        EventsStreaming.foldedMoments(s, mDir), PCA_OUT, EMB_DIMS, PCA_ITERS)
      finally deleteRecursively(mDir)
    comps.zipWithIndex.flatMap { case (row, c) =>
      row.zipWithIndex.map { case (x, dd) => (c, dd, x) }
    }.toSeq.toDF("c", "d", "x")
  }

  lazy val streamPcaSql: String =
    "WITH " + pcaTrainCtes(PCA_OUT, PCA_ITERS) +
      " SELECT CAST(c - 1 AS INT) AS c, CAST(d - 1 AS INT) AS d, " +
      "CAST(x AS BIGINT) AS x FROM comps"

  /** X24 as a driver-gate query: stream-stream inner join with
    * watermarks + interval condition (purchases × same-user signups in
    * the preceding hour), run to completion. Oracle = the identical
    * batch theta-join in microsecond epoch arithmetic (mirroring the
    * nanos→micros conversion the streaming source applies). */
  val streamJoin: Q = (s, d) => withStreamShuffle(s, 4) {
    val ckpt = streamCkptDir("graft-ckpt-sj")
    // ONE streaming source self-joined (supported with watermarks both
    // sides) — two separate readStreams would scan the input twice
    val src = EventsStreaming.readDriverEventsStream(s, s"$d/events.parque[t]")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_id"), col("s_id"))
    val q = joined.writeStream.format("memory").queryName("graft_stream_join")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_join")
  }

  /** X24b: stream-stream LEFT OUTER join — the state-EXPIRY emission
    * path the inner join never exercises: an unmatched purchase emits
    * its NULL-signup row only once the watermark passes its event time
    * and the join state flushes. NOT a driver row: the exact expiry
    * boundary depends on how AvailableNow splits micro-batches
    * (measured at three SFs — unmatched rows HOURS below the final
    * watermark can stay unflushed when they entered state in the last
    * data batch), so no closed-form SQL predicate reproduces the
    * emitted set reliably. StreamStreamJoinSpec pins the semantics
    * property-wise instead: matched pairs complete and exact,
    * every emitted unmatched row truly unmatched, no duplicates.
    * NULL s_id surfaces as −1; `p_us` carries event time for the
    * spec's boundary checks. */
  val streamOuterJoin: Q = (s, d) => withStreamShuffle(s, 4) {
    val ckpt = streamCkptDir("graft-ckpt-soj")
    val src = EventsStreaming.readDriverEventsStream(s, s"$d/events.parque[t]")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"),
      "left_outer")
      .select(col("user_id"), col("p_id"),
        coalesce(col("s_id"), lit(-1L)).as("s_id"),
        unix_micros(col("p_ts")).as("p_us"))
    val q = joined.writeStream.format("memory").queryName("graft_stream_oj")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_oj")
      .select(col("user_id"), col("p_id"), col("s_id"), col("p_us"))
  }

  /** X24b as a driver-gate row via the boolean-verdict pattern (the
    * q_hll_distinct trick): the NULL-EMIT SET is not a pure function
    * of the data (expiry depends on AvailableNow's micro-batch split —
    * see [[streamOuterJoin]]), so the hashable surface is (a) the
    * MATCHED rows, which must equal the batch inner join exactly, plus
    * (b) two per-run verdicts exported as constant columns: every
    * emitted NULL row is truly unmatched in the batch data, and no
    * (p_id, s_id) pair is duplicated nor any purchase emitted both
    * matched and NULL. The oracle is the batch inner join with literal
    * `true` verdicts — any semantic violation flips a Spark-side
    * boolean and the hash goes red. */
  val streamOuterJoinVerified: Q = (s, d) => {
    val out = streamOuterJoin(s, d).persistTracked()
    val signups = Tables.events(s, d).filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("s_us"))
    val nullEmits = out.filter(col("s_id") === -1L)
    // a NULL-emit with a qualifying batch signup = broken outer semantics
    val falseNulls = nullEmits.join(signups,
      col("user_id") === col("s_user") &&
        col("s_us") >= col("p_us") - 3600000000L &&
        col("s_us") <= col("p_us"), "left_semi")
    val dupPairs = out.groupBy("p_id", "s_id").count().filter(col("count") > 1)
    // one groupBy, not a memory-table self-join (MemoryPlan relations
    // don't dedup attributes): a purchase emitted both matched and NULL
    val mixedEmits = out.groupBy("p_id")
      .agg(max(when(col("s_id") === -1L, 1).otherwise(0)).as("_hasNull"),
        max(when(col("s_id") =!= -1L, 1).otherwise(0)).as("_hasMatch"))
      .filter(col("_hasNull") === 1 && col("_hasMatch") === 1)
    // ONE driver action for all three verdicts (three .isEmpty calls
    // would serialize as three job waves): cross the 1-row counts
    val v = falseNulls.agg(count(lit(1)).as("_fn"))
      .crossJoin(dupPairs.agg(count(lit(1)).as("_dp")))
      .crossJoin(mixedEmits.agg(count(lit(1)).as("_me")))
      .head()
    val nullOk = v.getLong(0) == 0L
    val dupOk = v.getLong(1) == 0L && v.getLong(2) == 0L
    out.filter(col("s_id") =!= -1L)
      .select(col("user_id"), col("p_id"), col("s_id"),
        lit(nullOk).as("null_emits_unmatched"),
        lit(dupOk).as("no_duplicates"))
  }

  val streamOuterJoinVerifiedSql: String =
    "SELECT p.user_id, p.event_id AS p_id, s.event_id AS s_id, " +
      "true AS null_emits_unmatched, true AS no_duplicates " +
      "FROM (SELECT user_id, event_id, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase') p " +
      "JOIN (SELECT user_id, event_id, epoch_us(ts) AS st FROM events WHERE event_type = 'signup') s " +
      "ON p.user_id = s.user_id AND s.st >= p.pt - 3600000000 AND s.st <= p.pt"

  /** Category dimension for the stream-static enrichment join —
    * a literal lookup table (in production: a refreshable dim read
    * per micro-batch). */
  private[queries] val eventCategories: Seq[(String, String)] = Seq(
    "view" -> "engage", "click" -> "engage",
    "purchase" -> "convert", "signup" -> "convert",
    "error" -> "ops")

  /** ACTUAL stream-static join run: readStream events enriched
    * against a broadcast static dim, then windowed agg per category —
    * the always-on lookup-enrichment pipeline. Oracle = the same
    * join+agg as batch SQL. */
  val streamStaticJoin: Q = (s, d) => withStreamShuffle(s, 8) {
    import s.implicits._
    val ckpt = streamCkptDir("graft-ckpt-ssj")
    val dim = eventCategories.toDF("event_type", "category")
    val q = EventsStreaming.enrichedWindowedAgg(
      EventsStreaming.readDriverEventsStream(s, s"$d/events.parque[t]"), dim)
      .writeStream.format("memory").queryName("graft_stream_ssj")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    runStreamThenCleanCkpt(q, ckpt)
    s.table("graft_stream_ssj")
      .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
        col("category"), col("n"), col("total"))
  }

  val streamStaticJoinSql: String = {
    val dimRows = eventCategories
      .map { case (t, c) => s"('$t','$c')" }.mkString(", ")
    s"WITH dim(event_type, category) AS (VALUES $dimRows) " +
      "SELECT CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS win_start_epoch, " +
      "category, COUNT(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total " +
      "FROM events JOIN dim USING (event_type) GROUP BY 1, 2"
  }

  /** Spark 4 arbitrary-state streaming (`transformWithState` on the
    * RocksDB state store): per-user running totals, every event tagged
    * with its user's count/sum so far. Oracle = the batch cumulative
    * window — integer-cents state makes the stream bit-equal to it. */
  val streamRunningTotals: Q = (s, d) => withStreamShuffle(s, 8) {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = streamCkptDir("graft-ckpt-tws")
      val src = EventsStreaming.readDriverEventsStream(s, s"$d/events.parque[t]")
      val q = EventsStreaming.runningTotals(src)
        .writeStream.format("memory").queryName("graft_stream_tws")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      runStreamThenCleanCkpt(q, ckpt)
      s.table("graft_stream_tws")
    } finally {
      prevProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
    }
  }

  val streamRunningTotalsSql: String =
    "SELECT event_id, user_id, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_n, " +
      "CAST(SUM(CAST(value AS DECIMAL(20,2))) OVER (PARTITION BY user_id " +
      "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum " +
      "FROM events"

  val streamJoinSql: String =
    "SELECT p.user_id, p.event_id AS p_id, s.event_id AS s_id " +
      "FROM (SELECT user_id, event_id, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase') p " +
      "JOIN (SELECT user_id, event_id, epoch_us(ts) AS st FROM events WHERE event_type = 'signup') s " +
      "ON p.user_id = s.user_id AND s.st >= p.pt - 3600000000 AND s.st <= p.pt"

  val sessionize: Q = (s, d) =>
    EventsStreaming.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
      .select(col("user_id"),
        unix_timestamp(col("session_start")).as("start_epoch"),
        unix_timestamp(col("session_end")).as("end_epoch"),
        col("n_events"), col("total_value"))

  val sessionizeSql: String =
    "WITH e AS (SELECT user_id, ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec, " +
      "lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), " +
      "m AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS brk FROM e), " +
      "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM m) " +
      "SELECT user_id, MIN(sec) AS start_epoch, MAX(sec) AS end_epoch, COUNT(*) AS n_events, " +
      "CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value " +
      "FROM g GROUP BY user_id, sess"

  /** Per-source calibrated quality filtering (X120, FineWeb-style
    * adaptive threshold): per source keep the smallest ties-inclusive
    * head covering the top 30% by token count. The thresholds come
    * from the (source, score) frequency table — the corpus never
    * sorts — and apply as a broadcast map-side filter. Oracle = the
    * same frequency-table cumulative scan in SQL. */
  val domainThreshold: Q = (s, d) =>
    graft.operators.ScaleOps.calibratedQualityFilter(
      Tables.documents(s, d), "doc_id", "source",
      TextFunctions.tokenCount(col("text")), keepBp = 3000)

  val domainThresholdSql: String =
    s"WITH sc AS (SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS q FROM documents), " +
      "cnt AS (SELECT source, q, count(*) AS c FROM sc GROUP BY source, q), " +
      "cum AS (SELECT source, q, CAST(sum(c) OVER (PARTITION BY source ORDER BY q DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm, " +
      "CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n FROM cnt), " +
      "th AS (SELECT source, max(q) AS t FROM cum WHERE cm * 10000 >= n * 3000 GROUP BY source) " +
      "SELECT sc.doc_id, sc.source, sc.q AS quality, th.t AS threshold " +
      "FROM sc JOIN th ON sc.source = th.source WHERE sc.q >= th.t"

  /** NATIVE session windows (X118): Spark's built-in session_window
    * operator (engine-managed merging session state) vs q_sessionize's
    * custom flatMapGroupsWithState. Full-precision event time — the
    * gap rule and window bounds work in micros, so the oracle compares
    * epoch_us (sessionize deliberately flattens to seconds; this one
    * must not). session_end = last event + gap by session_window's
    * definition; a new event at EXACTLY prev + gap MERGES into the
    * session (Spark merges while eventTime <= sessionEnd — pinned in
    * StreamingSpec), hence the strict > break below. */
  val sessionWindow: Q = (s, d) =>
    EventsStreaming.sessionWindowAgg(Tables.events(s, d), gapMinutes = 30)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"), col("total_value"))

  val sessionWindowSql: String =
    "WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS us, " +
      "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), " +
      "m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM e), " +
      "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM m) " +
      "SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events, " +
      "CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value " +
      "FROM g GROUP BY user_id, sess"

  /** Per-source corpus content digest (X128): order-free,
    * partitioning-free multiset checksums (row count, 60-bit XOR,
    * mod-p sum) — the snapshot-validation manifest; digest columns are
    * restricted to exactly-stringifying types (ints/strings) so the
    * canonical row text is engine-identical. */
  val corpusDigest: Q = (s, d) =>
    graft.operators.ScaleOps.contentDigest(Tables.documents(s, d), "source",
      Seq("doc_id", "lang", "text"))

  val corpusDigestSql: String = {
    val canon = "concat_ws(chr(1), coalesce(CAST(doc_id AS VARCHAR), chr(0)), " +
      "coalesce(lang, chr(0)), coalesce(text, chr(0)))"
    s"WITH h AS (SELECT source, CAST(CAST('0x' || substr(md5($canon), 1, 15) AS UBIGINT) AS BIGINT) AS h FROM documents) " +
      "SELECT source, count(*) AS n_rows, bit_xor(h) AS xor_digest, " +
      "CAST(CAST(sum(h % 1000000007) AS HUGEINT) % 1000000007 AS BIGINT) AS sum_digest " +
      "FROM h GROUP BY source"
  }

  /** Manifest diff (X129): yesterday's snapshot = the full corpus;
    * today's = the corpus minus the doc_id % 50 == 7 rows plus one doc
    * under a brand-new source — so the gate row exercises unchanged,
    * changed, AND added in one diff (removed is pinned by spec). The
    * whole comparison runs on the two #sources-row manifests. */
  val snapshotDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val today = docs.filter(col("doc_id") % 50 =!= 7)
      .unionByName(docs.filter(col("doc_id") === 0)
        .withColumn("source", lit("src_launched_today")))
    val cols = Seq("doc_id", "lang", "text")
    graft.operators.ScaleOps.manifestDiff(
      graft.operators.ScaleOps.contentDigest(docs, "source", cols),
      graft.operators.ScaleOps.contentDigest(today, "source", cols),
      "source")
  }

  val snapshotDiffSql: String = {
    val canon = "concat_ws(chr(1), coalesce(CAST(doc_id AS VARCHAR), chr(0)), " +
      "coalesce(lang, chr(0)), coalesce(text, chr(0)))"
    def manifest(src: String) =
      s"SELECT source, count(*) AS n, bit_xor(h) AS x, " +
        "CAST(CAST(sum(h % 1000000007) AS HUGEINT) % 1000000007 AS BIGINT) AS sm " +
        s"FROM (SELECT source, CAST(CAST('0x' || substr(md5($canon), 1, 15) AS UBIGINT) AS BIGINT) AS h FROM $src) GROUP BY source"
    "WITH today AS (SELECT doc_id, lang, text, source FROM documents WHERE doc_id % 50 <> 7 " +
      "UNION ALL SELECT doc_id, lang, text, 'src_launched_today' AS source FROM documents WHERE doc_id = 0), " +
      s"om AS (${manifest("documents")}), nm AS (${manifest("today")}) " +
      "SELECT coalesce(om.source, nm.source) AS source, " +
      "CASE WHEN om.source IS NULL THEN 'added' WHEN nm.source IS NULL THEN 'removed' " +
      "WHEN om.n = nm.n AND om.x = nm.x AND om.sm = nm.sm THEN 'unchanged' ELSE 'changed' END AS status, " +
      "coalesce(om.n, 0) AS old_rows, coalesce(nm.n, 0) AS new_rows " +
      "FROM om FULL OUTER JOIN nm ON om.source = nm.source"
  }

  /** Interval-overlap join (X127): which sessions of one user cohort
    * overlap in time with sessions of another — the interval×interval
    * theta join gridded into an equi-join on hour cells. Sessions come
    * from the oracled gaps-and-islands chain; bounds compare in exact
    * epoch micros. */
  val intervalJoin: Q = (s, d) => {
    val sess = EventsStreaming.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
    val a = sess.filter(col("user_id") % 7 === 0)
      .select(col("user_id").as("u1"), col("s_us").as("s1"), col("e_us").as("e1"))
    val b = sess.filter(col("user_id") % 5 === 0)
      .select(col("user_id").as("u2"), col("s_us").as("s2"), col("e_us").as("e2"))
    graft.operators.ScaleOps
      .intervalOverlapJoin(a, "s1", "e1", b, "s2", "e2", cellSize = 3600000000L)
      .filter(col("u1") =!= col("u2"))
  }

  val intervalJoinSql: String =
    "WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us, CAST(floor(epoch(ts)) AS BIGINT) AS sec, " +
      "lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), " +
      "m AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS brk FROM e), " +
      "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM m), " +
      "sessions AS MATERIALIZED (SELECT user_id, MIN(us) AS s_us, MAX(us) AS e_us " +
      "FROM g GROUP BY user_id, sess), " +
      "a AS (SELECT user_id AS u1, s_us AS s1, e_us AS e1 FROM sessions WHERE user_id % 7 = 0), " +
      "b AS (SELECT user_id AS u2, s_us AS s2, e_us AS e2 FROM sessions WHERE user_id % 5 = 0) " +
      "SELECT u1, s1, e1, u2, s2, e2 FROM a JOIN b ON s1 <= e2 AND s2 <= e1 WHERE u1 <> u2"

}
