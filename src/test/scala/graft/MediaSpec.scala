package graft

import graft.multimodal.{Media, MediaCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary transport, typed metadata, batched
  * partition-level feature extraction (stub codec), frame-sampling and
  * resize planning.
  */
class MediaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the fast key order sort", "en", "src0", 23L),
    (1L, "join a filter window row", "de", "src1", 24L),
    (2L, "agg line group hash vector", "es", "src2", 26L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("fromDocuments carries bytes + metadata with deterministic kinds") {
    val m = Media.fromDocuments(docs).collect().sortBy(_.doc_id)
    assert(m.map(_.kind).toSeq == Seq("image", "audio", "video")) // element_at is 1-based: (id%3)+1
    assert(m(0).content.toSeq == "the fast key order sort".getBytes("UTF-8").toSeq)
    assert(m(0).size_bytes == 23L)
    assert(m(0).mime_type == "image/png")
  }

  test("extractFeatures runs per-partition and matches the stub codec directly") {
    val feats = Media.extractFeatures(Media.fromDocuments(docs)).collect().sortBy(_.doc_id)
    val expect = MediaCodec.decode("image", "the fast key order sort".getBytes("UTF-8"))
    assert(feats(0).n_frames == expect.nFrames)
    assert(feats(0).feature.toSeq == expect.histogram.toSeq)
    assert(feats(0).feature.length == 16)
    assert((feats(0).out_width, feats(0).out_height) ==
      Media.resizeDims(expect.width, expect.height, 640))
    assert(feats(0).n_sampled_frames == Media.sampleFrameIndices(expect.nFrames, 4, 32).length)
    // histogram is normalized
    assert(math.abs(feats(0).feature.sum - 1.0f) < 1e-4)
  }

  test("frame sampling picks every k-th index, capped") {
    assert(Media.sampleFrameIndices(10, 3, 100) == Seq(0, 3, 6, 9))
    assert(Media.sampleFrameIndices(1000, 2, 4) == Seq(0, 2, 4, 6))
    assert(Media.sampleFrameIndices(0, 2, 4) == Seq.empty)
  }

  test("resize preserves aspect ratio and never upsamples") {
    assert(Media.resizeDims(1920, 1080, 640) == ((640, 360)))
    assert(Media.resizeDims(1080, 1920, 640) == ((360, 640)))
    assert(Media.resizeDims(320, 200, 640) == ((320, 200)))
    assert(Media.resizeDims(0, 100, 640) == ((0, 0)))
  }

  test("decode stub is marked as a stub") {
    assert(MediaCodec.DecodeIsStub)
  }
}
