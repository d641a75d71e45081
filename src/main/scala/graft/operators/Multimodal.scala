package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * functions (the Scala analogue of `mapInPandas` — one
  * `mapPartitions` over an iterator, amortizing any per-batch codec
  * setup across the partition).
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake features from
  * the bytes. Everything around it — schema, binary payload handling,
  * batch iteration, partition sizing — is real and is what matters at
  * 100 TB: payloads never enter a shuffle (feature extraction happens
  * before any wide op; only the small feature vectors shuffle), and
  * partitions are sized by `spark.sql.files.maxPartitionBytes` so a
  * partition of payloads fits executor memory.
  */
object Multimodal {

  /** Media row: opaque payload + typed metadata, the storage schema a
    * real pipeline would use for images/frames/audio chunks. */
  case class MediaRow(media_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
      first_byte: Int, last_byte: Int, byte_sum_mod: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Synthesize a media table from `documents` (text bytes stand in
    * for an encoded image payload) — the plumbing-under-test is the
    * binary column, not the codec. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("fmt"), (col("doc_id") % 3).cast("string")).as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** STUB decoder — stands in for image/audio decode. Deterministic
    * pure function of the bytes so tests and oracles can verify the
    * plumbing. A real deployment swaps only this function body for a
    * codec call; the batching/partitioning contract is unchanged. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.isEmpty) (-1, -1, 0L)
    else {
      var s = 0L
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      (payload(0) & 0xff, payload(payload.length - 1) & 0xff, s % 1000000007L)
    }
  }

  /** Batched per-partition feature extraction (mapInPandas-shaped):
    * one pass over the partition iterator, constant per-partition
    * setup, no payload ever leaves the map stage. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized like
        // mapInPandas' per-batch setup)
        it.map { case (id, payload, fmt) =>
          val (first, last, sum) = decodeStub(payload)
          MediaFeatures(id, fmt,
            if (payload == null) 0L else payload.length.toLong, first, last, sum)
        }
      }
  }

  case class MediaResized(media_id: Long, resized: Array[Byte], n_out: Int)

  /** STUB resize — stands in for an image resize: deterministic
    * stride-downsample of the payload to ≤ `targetBytes` bytes
    * (byte i*stride for i < min(n, target), stride = n / n_out,
    * integer math). Swapping the body for a real scaler keeps the
    * batching contract unchanged, like decodeStub. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return Array.emptyByteArray
    val nOut = math.min(payload.length, targetBytes)
    val stride = payload.length / nOut
    Array.tabulate(nOut)(i => payload(i * stride))
  }

  /** Batched per-partition resize (same mapInPandas-shaped contract as
    * extractFeatures — payloads never leave the map stage). */
  def resizePayloads(media: DataFrame, targetBytes: Int): Dataset[MediaResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val out = resizeStub(payload, targetBytes)
          MediaResized(id, out, out.length)
        }
      }
  }

  /** Frame-sampling shape: explode a video payload into every nth
    * "frame" (fixed-size byte slice), keeping (media_id, frame_idx,
    * frame_bytes). Pure column ops — the slicing pattern a real
    * frame sampler follows after decode. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    media
      .select(col("media_id"), col("payload"), nFrames.as("_n"))
      .filter(col("_n") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("_n") - 1, lit(everyNth))).as("frame_idx"),
        col("payload"))
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }
}
