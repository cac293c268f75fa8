package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import Multimodal._

/** Multimodal plumbing: batch decode seam, frame sampling byte ranges,
  * resize metadata. The codec itself is a deterministic stub — the
  * plumbing (schema, batching, ranges) is what's under test. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mk(id: Long, s: String, nFrames: Int = 4): Media =
    Media(id, "video", s.getBytes("UTF-8"), 64, 32, nFrames)

  test("mapDecodeBatches: one feature row per media row, checksum = byte fold") {
    val data = Seq(mk(1, "abc"), mk(2, ""), mk(3, "hello world"))
    val ds = spark.createDataset(data)(Encoders.product[Media])
    val out = mapDecodeBatches(ds, batchSize = 2).collect().sortBy(_.media_id)
    assert(out.length == 3)
    def fold(s: String) =
      s.getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(out(0).checksum == fold("abc"))
    assert(out(1).byte_len == 0 && out(1).mean_byte == 0.0)
    assert(out(2).byte_len == 11)
    assert(approx(out(2).mean_byte,
      "hello world".getBytes.map(_ & 0xff).sum.toDouble / 11))
  }

  test("mapEmbedBatches: histogram embedding, exact ints, feeds Similarity") {
    val ds = spark.createDataset(
      Seq(mk(1L, "aab"), mk(2L, "aab"), mk(3L, "zzzz")))(Encoders.product[Media])
    val out = Multimodal.mapEmbedBatches(ds, dim = 4, batchSize = 2)
      .collect().map(e => e.media_id -> e.embedding).toMap
    // 'a'=97 → bucket 1, contributes 98 each; 'b'=98 → bucket 2, 99
    assert(out(1L)(1) == 196f && out(1L)(2) == 99f && out(1L)(0) == 0f)
    assert(out(1L) == out(2L)) // identical payloads → identical vectors
    // identical vectors → cosine 1.0 through the similarity operator
    val embs = Multimodal.mapEmbedBatches(ds, dim = 4).toDF()
      .select($"media_id".as("vec_id"), $"embedding")
    val top = Similarity.bruteForceTopK(embs, embs.filter($"vec_id" === 1), k = 1)
      .as[(Long, Long, Double, Int)].head()
    assert(top._2 == 2L && top._3 == 1.0)
  }

  test("sampleFrames: offsets tile the payload after the header") {
    // 16-byte header + 4 frames of 3 bytes
    val payload = "HHHHHHHHHHHHHHHH" + "aaabbbcccddd"
    val df = Seq((1L, payload, 4)).toDF("media_id", "text", "n_frames")
      .select($"media_id", $"text".cast("binary").as("bytes"), $"n_frames")
    val out = sampleFrames(df, stride = 2).orderBy("frame_idx")
      .select("frame_idx", "frame_offset", "frame_len").as[(Int, Int, Int)].collect()
    assert(out.toSeq == Seq((0, 16, 3), (2, 22, 3))) // frames 0 and 2
  }

  test("sampleFrames: frame checksum hashes exactly the frame's slice") {
    val payload = "HHHHHHHHHHHHHHHH" + "aaabbb"
    val df = Seq((1L, payload, 2)).toDF("media_id", "text", "n_frames")
      .select($"media_id", $"text".cast("binary").as("bytes"), $"n_frames")
    val out = sampleFrames(df, stride = 1).orderBy("frame_idx")
      .select("frame_checksum").as[Long].collect()
    def fold(s: String) =
      s.getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(out.toSeq == Seq(fold("aaa"), fold("bbb")))
  }

  test("resizeMeta: aspect-preserving downscale, never upscales") {
    val df = Seq((1L, 640, 480), (2L, 100, 50)).toDF("media_id", "width", "height")
    val out = resizeMeta(df, maxDim = 320).orderBy("media_id")
      .select("out_width", "out_height").as[(Int, Int)].collect()
    assert(out(0) == ((320, 240)))
    assert(out(1) == ((100, 50))) // already under maxDim → untouched
  }
}
