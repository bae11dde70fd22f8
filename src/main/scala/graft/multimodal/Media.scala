package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video content is carried as opaque `binary` columns with typed
  * metadata, and decode / feature-extract / resize / frame-sample run as
  * batched partition-level transforms (`mapPartitions` over a typed
  * Dataset — the JVM analog of a Pandas-batch UDF: one iterator per
  * partition, amortized per-batch setup, vectorizable inner loop).
  *
  * IMAGE decode is REAL: `javax.imageio.ImageIO` ships inside every JDK
  * (PNG/JPEG/BMP/GIF), so image payloads are decoded to actual pixels and
  * the width/height/histogram features come from the decoded raster.
  * Audio/video codecs are NOT available in this environment, so those two
  * kinds keep a clearly-marked deterministic stub (see
  * `MediaCodec.decodeIsStub`): the Spark-side plumbing — schema, binary
  * transport, partitioning, batch shape, feature vector layout — is
  * identical across kinds; swapping in a real audio/video codec changes
  * only the stub branch.
  */
object Media {

  /** One media object: opaque bytes + typed metadata. */
  case class MediaRow(
      doc_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      mime_type: String,
      size_bytes: Long
  )

  /** Extracted features: decoded dimensions, the resize plan (long edge
    * 640, aspect preserved), the frame-sample plan (every 4th frame, ≤32),
    * and a fixed-width float vector (16-bin byte histogram from the stub
    * decoder).
    */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      out_width: Int,
      out_height: Int,
      n_sampled_frames: Int,
      feature: Array[Float],
      hist_counts: Array[Long] // raw integer bin counts behind `feature`
  )

  private val kinds = Array("image", "audio", "video")
  private val mimes = Map("image" -> "image/png", "audio" -> "audio/wav", "video" -> "video/mp4")

  /** Derive a deterministic media table from the driver `documents` table:
    * content = the doc's UTF-8 bytes posing as an encoded media payload,
    * kind assigned round-robin by doc_id. At 100 TB the content column
    * would be real encoded media read from parquet/binaryFile sources —
    * everything downstream is agnostic to that.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        element_at(lit(kinds), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        to_binary(col("text"), lit("utf-8")).as("content")
      )
      .withColumn(
        "mime_type",
        element_at(
          typedLit(mimes),
          col("kind")
        )
      )
      .withColumn("size_bytes", octet_length(col("content")).cast("long"))
      .as[MediaRow]
  }

  /** `fromDocuments` with image rows carrying a REAL encoded PNG
    * (deterministically generated from the doc_id — dims and pixels are a
    * pure function of it), so the decode stage downstream exercises the
    * genuine `javax.imageio` path. Audio/video rows keep the opaque text
    * bytes (their codecs stay stubbed). Used by s05; the transport/dedup
    * queries (q40/q69/q78) keep `fromDocuments`, whose payload identity
    * (content = UTF-8 text bytes) their oracles mirror in SQL.
    */
  def fromDocumentsDecodable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs).mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") {
          val png = MediaCodec.encodePng(m.doc_id)
          m.copy(content = png, size_bytes = png.length.toLong)
        } else m
      }
    }
  }

  /** Stage the decodable media table to parquet once per (JVM, source
    * key) — PNG ENCODING is corpus staging, not the measured operator (at
    * 100 TB the encoded media already sits in storage; a pipeline run
    * scans and DECODES it). Repeated s05 runs therefore measure the real
    * repeating cost: parquet scan + imageio decode + feature extraction.
    */
  private val stagedCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def stageDecodable(docs: DataFrame, key: String): String =
    stagedCache.computeIfAbsent(
      key,
      _ => {
        val out = java.nio.file.Files.createTempDirectory("graft_s05_").toAbsolutePath.toString + "/media"
        fromDocumentsDecodable(docs).write.mode("overwrite").parquet(out)
        out
      }
    )

  /** Batched partition-level decode + feature extraction — the
    * mapPartitions shape: per-partition setup once, then a streamed
    * per-row inner loop.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would construct the codec context here (once,
      // not per row) — the stub has none.
      it.map { m =>
        val d = MediaCodec.decode(m.kind, m.content)
        val (ow, oh) = resizeDims(d.width, d.height, targetLong = 640)
        val sampled = sampleFrameIndices(d.nFrames, everyK = 4, maxFrames = 32)
        MediaFeatures(
          m.doc_id, m.kind, d.width, d.height, d.nFrames, ow, oh, sampled.length,
          d.histogram, d.histCounts)
      }
    }
  }

  /** Frame-sampling plan: pick every k-th frame index up to `maxFrames` —
    * pure metadata math, runs before any decode so a real pipeline decodes
    * ONLY sampled frames.
    */
  def sampleFrameIndices(nFrames: Int, everyK: Int, maxFrames: Int): Seq[Int] =
    (0 until nFrames by everyK).take(maxFrames)

  /** Resize plan: target dims preserving aspect ratio with even rounding —
    * metadata-only here; a real codec applies it at decode time.
    */
  def resizeDims(w: Int, h: Int, targetLong: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) return (0, 0)
    if (math.max(w, h) <= targetLong) (w, h)
    else if (w >= h) (targetLong, math.max(1, math.round(h.toDouble * targetLong / w).toInt))
    else (math.max(1, math.round(w.toDouble * targetLong / h).toInt), targetLong)
  }
}

/** Media codec: IMAGES decode for real via `javax.imageio` (in every JDK —
  * no extra jar); audio/video remain a deterministic STUB (those codecs
  * are not present in this container). Stub values are a pure function of
  * the payload bytes so tests and the driver's rows-only check are
  * reproducible.
  */
object MediaCodec {

  /** Which kinds still run the deterministic stub. Replace the stub
    * branch of `decode` with a real codec binding (e.g. JCodec on the
    * JVM) to productionize audio/video; images are already real.
    */
  def decodeIsStub(kind: String): Boolean = kind != "image"

  // ImageIO's default file-backed stream cache would write temp files per
  // decode on every executor thread; in-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  case class Decoded(
      width: Int,
      height: Int,
      nFrames: Int,
      histogram: Array[Float],
      histCounts: Array[Long]
  )

  /** Deterministic PNG dims for the generated image of `docId` — every
    * 10th image is wide beyond the 640 resize target so the real decode
    * path exercises the resize plan too.
    */
  def pngDims(docId: Long): (Int, Int) = {
    val w = 16 + (docId % 37).toInt
    val h = 12 + (docId % 29).toInt
    if (docId % 10 == 0) (w * 24, h) else (w, h)
  }

  /** A real PNG payload, pixels a pure function of (docId, x, y). */
  def encodePng(docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val id = (docId % 251).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 31 + y * 17 + id) & 0xff
        val g = (x * 13 + y * 43 + id * 3) & 0xff
        val b = (x * 59 + y * 7 + id * 5) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decode(kind: String, bytes: Array[Byte]): Decoded = kind match {
    case "image" =>
      // REAL decode: actual pixels from the compressed payload. An
      // undecodable payload is a corrupt media object — report it as
      // (0, 0, 0, zero-histogram) the way a production pipeline tags
      // corrupt blobs for quarantine, never as fake dims.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) Decoded(0, 0, 0, new Array[Float](16), new Array[Long](16))
      else {
        val w = img.getWidth
        val h = img.getHeight
        val counts = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            counts(((rgb >> 16) & 0xff) >> 4) += 1L
            counts(((rgb >> 8) & 0xff) >> 4) += 1L
            counts((rgb & 0xff) >> 4) += 1L
            x += 1
          }
          y += 1
        }
        val n = 3f * w * h
        val hist = new Array[Float](16)
        if (n > 0f) { var j = 0; while (j < 16) { hist(j) = counts(j).toFloat / n; j += 1 } }
        Decoded(w, h, 1, hist, counts)
      }
    case _ =>
      val n = bytes.length
      // deterministic STUB dimensions from payload size (audio/video)
      val (w, h, frames) =
        if (kind == "audio") (1, 1, 1 + n % 977) // "frames" = sample blocks
        else (64 + n % 577, 64 + n % 353, 1 + n % 97)
      // real feature shape: fixed-width byte histogram (16 bins), integer
      // counts kept beside the normalized floats (the counts are exact,
      // hence oracle-expressible — q86)
      val counts = new Array[Long](16)
      var i = 0
      while (i < n) { counts((bytes(i) & 0xff) >> 4) += 1L; i += 1 }
      val hist = new Array[Float](16)
      if (n > 0) { var j = 0; while (j < 16) { hist(j) = counts(j).toFloat / n.toFloat; j += 1 } }
      Decoded(w, h, frames, hist, counts)
  }
}
