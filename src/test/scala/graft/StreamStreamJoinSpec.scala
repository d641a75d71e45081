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
}
