package graft

import graft.multimodal.{Media, MediaCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary transport, typed metadata, batched
  * partition-level feature extraction (REAL javax.imageio decode for
  * images, REAL javax.sound.sampled WAV decode for audio, REAL RIFF/AVI
  * chunk-walk + per-frame javax.imageio decode for video),
  * corrupt-payload quarantine, frame-sampling and resize planning.
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

  test("fromDocumentsDecodable swaps image payloads for PNGs, audio for WAVs, video for AVIs") {
    val m = Media.fromDocumentsDecodable(docs).collect().sortBy(_.doc_id)
    // PNG magic bytes on the image row
    assert(m(0).content.take(8).toSeq == Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    assert(m(0).size_bytes == m(0).content.length.toLong)
    // audio row: a real RIFF/WAVE container
    assert(m(1).content.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    assert(m(1).content.slice(8, 12).toSeq == "WAVE".getBytes("US-ASCII").toSeq)
    assert(m(1).size_bytes == m(1).content.length.toLong)
    // video row: a real RIFF/AVI container
    assert(m(2).content.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    assert(m(2).content.slice(8, 12).toSeq == "AVI ".getBytes("US-ASCII").toSeq)
    assert(m(2).size_bytes == m(2).content.length.toLong)
  }

  test("AVI codec round-trips dims, frame count and sampled-frame pixels exactly") {
    val docId = 5L // 5 % 3 = 2 -> video kind
    val d = MediaCodec.decode("video", MediaCodec.encodeAvi(docId))
    assert((d.width, d.height) == MediaCodec.vidDims(docId))
    assert(d.nFrames == MediaCodec.vidFrames(docId))
    // expected census: the shared per-frame pixel recipe over the SAMPLED
    // frames only (every 4th) — mirrors the q88 oracle's SQL
    val (w, h) = MediaCodec.vidDims(docId)
    val id = (docId % 251).toInt
    val expect = new Array[Long](16)
    Media.sampleFrameIndices(d.nFrames, 4, 32).foreach { f =>
      for (y <- 0 until h; x <- 0 until w) {
        expect(((x * 31 + y * 17 + id + f * 11) & 0xff) >> 4) += 1L
        expect(((x * 13 + y * 43 + id * 3 + f * 29) & 0xff) >> 4) += 1L
        expect(((x * 59 + y * 7 + id * 5 + f * 53) & 0xff) >> 4) += 1L
      }
    }
    assert(d.histCounts.toSeq == expect.toSeq)
    assert(math.abs(d.histogram.sum - 1.0f) < 1e-4)
  }

  test("video decodes ONLY sampled frames: census counts 3*w*h per sampled frame") {
    // doc_id 9 -> 10 frames, sampled = frames {0, 4, 8} (3 of 10): the
    // histogram mass proves the parser skipped the other 7 frames
    val docId = 9L
    assert(MediaCodec.vidFrames(docId) == 10)
    val d = MediaCodec.decode("video", MediaCodec.encodeAvi(docId))
    val (w, h) = MediaCodec.vidDims(docId)
    assert(d.nFrames == 10)
    assert(d.histCounts.sum == 3L * w * h * Media.sampleFrameIndices(10, 4, 32).length)
  }

  test("undecodable video payload is tagged corrupt, not faked") {
    val d = MediaCodec.decode("video", "not an avi".getBytes("UTF-8"))
    assert((d.width, d.height, d.nFrames) == ((0, 0, 0)))
    assert(d.histCounts.forall(_ == 0L))
    // a truncated-mid-header AVI (the isCorrupt slice's shape: the 12-byte
    // RIFF magic with all chunks cut off) quarantines too
    val trunc = MediaCodec.encodeAvi(5L).take(12)
    val dt = MediaCodec.decode("video", trunc)
    assert((dt.width, dt.height, dt.nFrames) == ((0, 0, 0)))
    // and a container whose frame bytes are garbage quarantines rather
    // than reporting half-decoded features
    val avi = MediaCodec.encodeAvi(5L)
    val mangled = avi.clone()
    val moviAt = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    java.util.Arrays.fill(mangled, moviAt + 12, math.min(moviAt + 40, mangled.length), 0x00.toByte)
    val dm = MediaCodec.decode("video", mangled)
    assert((dm.width, dm.height, dm.nFrames) == ((0, 0, 0)))
  }

  test("WAV codec round-trips sample frames exactly (javax.sound.sampled)") {
    val samples = "join a filter window row".getBytes("UTF-8")
    val d = MediaCodec.decode("audio", MediaCodec.encodeWav(samples))
    assert(d.nFrames == samples.length)
    assert((d.width, d.height) == ((1, 8))) // (channels, sampleSizeInBits)
    // decoded-sample high-nibble census == the census of the input bytes
    val expect = new Array[Long](16)
    samples.foreach(b => expect((b & 0xff) >> 4) += 1L)
    assert(d.histCounts.toSeq == expect.toSeq)
    assert(math.abs(d.histogram.sum - 1.0f) < 1e-4)
  }

  test("undecodable audio payload is tagged corrupt, not faked") {
    val d = MediaCodec.decode("audio", "not a wav".getBytes("UTF-8"))
    assert((d.width, d.height, d.nFrames) == ((0, 0, 0)))
    assert(d.histCounts.forall(_ == 0L))
    // a truncated-mid-header WAV (the isCorrupt slice's shape) quarantines too
    val trunc = MediaCodec.encodeWav("some samples".getBytes("UTF-8")).take(12)
    val dt = MediaCodec.decode("audio", trunc)
    assert((dt.width, dt.height, dt.nFrames) == ((0, 0, 0)))
  }

  test("the deterministic corrupt slice quarantines end-to-end") {
    // doc_id 13 -> audio (13 % 3 = 1), 147 -> image (147 % 3 = 0),
    // 80 -> video (80 % 3 = 2); all three are on the isCorrupt slice
    // (x % 67 = 13) so their staged payloads truncate mid-header and must
    // decode to quarantine rows.
    assert(MediaCodec.isCorrupt(13L) && MediaCodec.isCorrupt(147L) && MediaCodec.isCorrupt(80L))
    val corruptDocs = Seq(
      (13L, "corrupt audio doc", "en", "src0", 17L),
      (80L, "corrupt video doc", "en", "src2", 17L),
      (147L, "corrupt image doc", "en", "src1", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats =
      Media.extractFeatures(Media.fromDocumentsDecodable(corruptDocs)).collect().sortBy(_.doc_id)
    assert(feats.map(_.kind).toSeq == Seq("audio", "video", "image"))
    feats.foreach { f =>
      assert((f.width, f.height, f.n_frames, f.n_sampled_frames) == ((0, 0, 0, 0)))
      assert(f.hist_counts.forall(_ == 0L))
    }
  }

  test("image decode is REAL: javax.imageio round-trips generated dims and pixels") {
    val d0 = MediaCodec.decode("image", MediaCodec.encodePng(7L))
    assert((d0.width, d0.height) == MediaCodec.pngDims(7L))
    assert(d0.nFrames == 1)
    assert(math.abs(d0.histogram.sum - 1.0f) < 1e-4)
    // a doc_id % 10 == 0 image is wider than the 640 resize target
    val wide = MediaCodec.pngDims(30L)
    assert(wide._1 > 640)
    assert(Media.resizeDims(wide._1, wide._2, 640)._1 == 640)
    // decoded histogram reflects the pixel formula, not the payload bytes:
    // a solid-color image concentrates all mass in the pixel-value bins
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, 0x102030)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = MediaCodec.decode("image", bos.toByteArray)
    assert((d.width, d.height) == ((4, 4)))
    assert(d.histogram(1) > 0.33f && d.histogram(2) > 0.33f && d.histogram(3) > 0.33f)
  }

  test("undecodable image payload is tagged corrupt, not faked") {
    val d = MediaCodec.decode("image", "not a png".getBytes("UTF-8"))
    assert((d.width, d.height, d.nFrames) == ((0, 0, 0)))
    assert(d.histogram.forall(_ == 0f))
  }

  test("extractFeatures runs per-partition: real image decode + real audio decode") {
    val feats = Media.extractFeatures(Media.fromDocumentsDecodable(docs)).collect().sortBy(_.doc_id)
    // image row: features come from the DECODED raster
    val expectImg = MediaCodec.decode("image", MediaCodec.encodePng(0L))
    assert((feats(0).width, feats(0).height) == MediaCodec.pngDims(0L))
    assert(feats(0).feature.toSeq == expectImg.histogram.toSeq)
    assert(feats(0).feature.length == 16)
    assert((feats(0).out_width, feats(0).out_height) ==
      Media.resizeDims(expectImg.width, expectImg.height, 640))
    assert(math.abs(feats(0).feature.sum - 1.0f) < 1e-4)
    // audio row: REAL WAV decode — the sample frames are the doc's UTF-8
    // bytes, so the decoded census equals the byte census
    val audioBytes = "join a filter window row".getBytes("UTF-8")
    assert(feats(1).n_frames == audioBytes.length)
    assert(feats(1).n_sampled_frames == Media.sampleFrameIndices(audioBytes.length, 4, 32).length)
    // integer counts ride beside the floats: they sum to the frame count
    // (audio: one vote per decoded sample) resp. 3*w*h (image: one vote
    // per channel), and the float histogram is exactly counts normalized
    assert(feats(1).hist_counts.sum == audioBytes.length.toLong)
    val expectAud = new Array[Long](16)
    audioBytes.foreach(b => expectAud((b & 0xff) >> 4) += 1L)
    assert(feats(1).hist_counts.toSeq == expectAud.toSeq)
    assert(feats(1).feature.toSeq ==
      expectAud.map(c => c.toFloat / audioBytes.length.toFloat).toSeq)
    assert(feats(0).hist_counts.sum == 3L * feats(0).width * feats(0).height)
    assert(
      feats(0).feature.toSeq ==
        feats(0).hist_counts.map(c => c.toFloat / (3f * feats(0).width * feats(0).height)).toSeq
    )
  }

  test("fixture corpus is ASCII: octet_length == length for every doc (q86 oracle premise)") {
    // q86's oracle counts code points where the engine counts bytes; the
    // equality only holds on an all-ASCII corpus. Pin that premise on
    // every scale factor the driver touches (verify: sf0.01, bench: sf0.1)
    // so a corpus change surfaces here, not as an opaque hash mismatch.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val bad = graft.ops.Tables
        .documents(spark, s"/root/testdata/$sf")
        .filter(octet_length(to_binary(col("text"), lit("utf-8"))) =!= length(col("text")))
        .count()
      assert(bad == 0L, s"non-ASCII documents in $sf break the q86 byte==char oracle premise")
    }
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

  test("stub flag: every decode path is real — image, audio AND video") {
    assert(!MediaCodec.decodeIsStub("image"))
    assert(!MediaCodec.decodeIsStub("audio"))
    assert(!MediaCodec.decodeIsStub("video"))
  }

  test("s05's surfaced f0 IS the float feature vector's bin 0 (to float precision)") {
    // s05's oracle became hash-checkable in round 11 by re-deriving f0
    // from the integer facets (r6(hist_counts(0) / Σ)); this pins that
    // the re-derivation still equals feature(0) — i.e. the surfaced
    // column genuinely represents the float feature vector, not a
    // lookalike. Tolerance is float32 ulp scale: normalize() divides in
    // Float, the query divides in Double.
    import spark.implicits._
    val staged = Media.stageDecodable(
      graft.ops.Tables.documentsSpread(spark, "/root/testdata/sf0.001"),
      "/root/testdata/sf0.001")
    val rows = Media
      .extractFeatures(spark.read.parquet(staged).as[Media.MediaRow])
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.hist_counts.sum
      val rederived = if (tot > 0) r.hist_counts(0).toDouble / tot else 0.0
      assert(
        math.abs(rederived - r.feature(0).toDouble) < 1e-6,
        s"doc ${r.doc_id}: f0 re-derivation ${rederived} vs feature(0) ${r.feature(0)}")
    }
  }
}
