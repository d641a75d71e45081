package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (10L, "abcdefghijklmnopqrstuvwxyz0123456789ABCD", "en", "s1", 40L),
    (11L, "short", "en", "s1", 5L),
    (12L, "héllo→", "fr", "s1", 6L)) // non-ASCII: bytes ≠ codepoints
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table has binary payload + typed metadata") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.filter(col("media_id") === 10L).collect()(0)
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("abcdef"))
  }

  test("extractFeatures: deterministic stub features via mapPartitions") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(10L).n_bytes == 40L)
    assert(feats(10L).first_byte == 'a'.toInt)
    assert(feats(10L).last_byte == 'D'.toInt)
    assert(feats(10L).byte_sum_mod ==
      "abcdefghijklmnopqrstuvwxyz0123456789ABCD".map(_.toLong).sum % 1000000007L)
  }

  test("features are UTF-8 BYTE semantics, not codepoints (non-ASCII)") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    val bytes = "héllo→".getBytes("UTF-8")
    assert(bytes.length == 9) // 6 codepoints, 9 bytes
    assert(feats(12L).n_bytes == 9L)
    assert(feats(12L).first_byte == (bytes.head & 0xff))
    assert(feats(12L).last_byte == (bytes.last & 0xff)) // 0x92, not '→'
    assert(feats(12L).byte_sum_mod ==
      bytes.map(b => (b & 0xff).toLong).sum % 1000000007L)
  }

  test("resizePayloads stride-samples to at most targetBytes, byte-true") {
    val resized = Multimodal.resizePayloads(
      Multimodal.mediaFromDocuments(docs), targetBytes = 8)
      .collect().map(r => r.media_id -> r).toMap
    // 40 bytes -> stride 5 -> bytes at 0,5,10,...,35
    val full = "abcdefghijklmnopqrstuvwxyz0123456789ABCD".getBytes("UTF-8")
    assert(resized(10L).resized.toSeq == (0 until 8).map(i => full(i * 5)).toSeq)
    assert(resized(10L).n_out == 8)
    // shorter than target: all bytes kept, stride 1
    assert(new String(resized(11L).resized, "UTF-8") == "short")
    // non-ASCII: operates on UTF-8 BYTES (9 bytes -> stride 1, first 8)
    val utf = "héllo→".getBytes("UTF-8")
    assert(resized(12L).resized.toSeq == utf.take(8).toSeq)
  }

  test("sampleFrames slices every nth fixed-size frame") {
    val m = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(m, frameBytes = 16, everyNth = 2)
      .select("media_id", "frame_idx", "frame")
      .as[(Long, Int, Array[Byte])].collect()
    val byDoc = frames.groupBy(_._1)
    // 40 bytes -> 2 full frames (idx 0,1), every 2nd -> idx 0 only
    assert(byDoc(10L).map(_._2).toSeq == Seq(0))
    assert(new String(byDoc(10L).head._3, "UTF-8") == "abcdefghijklmnop")
    assert(!byDoc.contains(11L)) // too short for any frame
  }
}
