package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventsStreaming

/** Stream-stream inner join with watermarks + interval condition (the
  * remaining Structured Streaming join family): purchases joined to
  * the same user's signups within the preceding hour. State on both
  * sides is bounded by the watermark/interval. Checked against the
  * identical batch join. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-ss-events").toString
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("stream-stream interval join == batch join") {
    val ckpt = Files.createTempDirectory("graft-ckpt-ss").toString
    def side(src: org.apache.spark.sql.DataFrame, t: String) = src
      .filter(col("event_type") === t)
    val stream = spark.readStream.schema(EventsStreaming.eventSchema).parquet(eventsDir)
    val purchases = side(stream, "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val signups = side(stream, "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "2 hours")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select("user_id", "p_id", "s_id")
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("ss_join_out")
      .as[(Long, Long, Long)].collect().toSet

    val batch = spark.read.parquet(eventsDir)
    val bp = side(batch, "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val bs = side(batch, "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"), col("ts").as("s_ts"))
    val expected = bp.join(bs,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select("user_id", "p_id", "s_id")
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed == expected && expected.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: matched exact, unmatched valid, no dupes") {
    // The expiry boundary for NULL-emission is micro-batch-split
    // dependent (measured: unmatched rows hours below the final
    // watermark can stay unflushed when they entered state in the last
    // data batch) — so the pin is property-wise, not an exact row set:
    //  1. matched pairs == the batch inner join (outer ⊇ inner, exact)
    //  2. every emitted unmatched row is TRULY unmatched in batch
    //  3. some unmatched rows do flush (the expiry path runs)
    //  4. no (p_id, s_id) duplicates
    val out = graft.queries.Extensions.streamOuterJoin(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(r => (r._2, r._3)).distinct.length == out.length)

    val batch = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    def side(t: String) = batch.filter(col("event_type") === t)
    val bp = side("purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val bs = side("signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"), col("ts").as("s_ts"))
    val matchedBatch = bp.join(bs,
      col("user_id") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("s_ts") <= col("p_ts"))
      .select("p_id", "s_id").as[(Long, Long)].collect().toSet
    val streamedMatched = out.filter(_._3 != -1L).map(r => (r._2, r._3)).toSet
    assert(streamedMatched == matchedBatch && matchedBatch.nonEmpty)

    val matchedPids = matchedBatch.map(_._1)
    val streamedUnmatched = out.filter(_._3 == -1L).map(_._2).toSet
    assert(streamedUnmatched.nonEmpty, "expiry path must emit NULL-joined rows")
    assert(streamedUnmatched.intersect(matchedPids).isEmpty,
      "an emitted NULL-joined purchase must have no batch match")
  }
}
