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
  * AUDIO decode is REAL too: `javax.sound.sampled.AudioSystem` (module
  * `java.desktop`, same as imageio) parses WAV/PCM containers, so audio
  * payloads are decoded to actual sample frames and the frame count /
  * histogram features come from the decoded samples. Only VIDEO keeps a
  * clearly-marked deterministic stub (no JVM-bundled video codec exists —
  * see `MediaCodec.decodeIsStub`): the Spark-side plumbing — schema,
  * binary transport, partitioning, batch shape, feature vector layout — is
  * identical across kinds; swapping in a real video codec (e.g. JCodec)
  * changes only the stub branch.
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
    * pure function of it) and audio rows carrying a REAL PCM WAV container
    * (8-bit unsigned mono; the sample frames ARE the doc's UTF-8 text
    * bytes, so the decoded sample histogram is closed-form in the text —
    * the q86 oracle). Video rows keep the opaque text bytes (that codec
    * stays stubbed). A deterministic slice of rows (`isCorrupt`) gets its
    * payload truncated mid-header — undecodable on purpose — so the
    * quarantine path is a first-class, oracle-visible part of the
    * pipeline, the way a 100 TB corpus always carries corrupt blobs.
    * The transport/dedup queries (q40/q69/q78) keep `fromDocuments`,
    * whose payload identity (content = UTF-8 text bytes) their oracles
    * mirror in SQL.
    */
  def fromDocumentsDecodable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    fromDocuments(docs).mapPartitions { it =>
      it.map { m =>
        val encoded = m.kind match {
          case "image" => MediaCodec.encodePng(m.doc_id)
          case "audio" => MediaCodec.encodeWav(m.content)
          case _       => m.content
        }
        val payload =
          if (MediaCodec.isCorrupt(m.doc_id) && m.kind != "video") encoded.take(12)
          else encoded
        m.copy(content = payload, size_bytes = payload.length.toLong)
      }
    }
  }

  /** Deterministic corrupt-payload slice of the decodable table — see
    * `MediaCodec.isCorrupt`.
    */
  def isCorrupt(docId: Long): Boolean = MediaCodec.isCorrupt(docId)

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

/** Media codec: IMAGES decode for real via `javax.imageio` and AUDIO
  * (WAV/PCM) for real via `javax.sound.sampled` — both ship inside every
  * JDK (`java.desktop` module), no extra jar. Only VIDEO remains a
  * deterministic STUB (no JVM-bundled video codec exists). Stub values are
  * a pure function of the payload bytes so tests and the driver's
  * rows-only check are reproducible.
  */
object MediaCodec {

  /** Which kinds still run the deterministic stub. Replace the stub
    * branch of `decode` with a real codec binding (e.g. JCodec on the
    * JVM) to productionize video; images and audio are already real.
    */
  def decodeIsStub(kind: String): Boolean = kind == "video"

  /** Deterministic corrupt-payload slice for the decodable media table:
    * these rows ship a truncated (mid-header) payload so every run
    * exercises the quarantine path end-to-end. Closed-form in doc_id so
    * the DuckDB oracles (q86/q87) can mirror exactly which rows
    * quarantine.
    */
  def isCorrupt(docId: Long): Boolean = docId % 67 == 13

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

  /** The quarantine row a corrupt (undecodable) payload maps to. */
  private def quarantined: Decoded =
    Decoded(0, 0, 0, new Array[Float](16), new Array[Long](16))

  private def normalize(counts: Array[Long]): Array[Float] = {
    val n = counts.sum.toFloat
    val hist = new Array[Float](16)
    if (n > 0f) { var j = 0; while (j < 16) { hist(j) = counts(j).toFloat / n; j += 1 } }
    hist
  }

  /** A real PCM WAV payload (8-bit unsigned, mono, 8 kHz) whose sample
    * frames are exactly `samples` — the audio analog of `encodePng`.
    * Written through `javax.sound.sampled.AudioSystem`, i.e. a genuine
    * RIFF/WAVE container, not a hand-rolled header.
    */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
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
        catch { case scala.util.control.NonFatal(_) => null }
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
        Decoded(w, h, 1, normalize(counts), counts)
      }
    case "audio" =>
      // REAL decode: `AudioSystem` parses the WAV container and streams
      // raw sample frames. Features come from the DECODED samples:
      // n_frames = the container's actual frame count, histogram = the
      // 16-bin high-nibble census of the 8-bit samples (integer-exact,
      // hence oracle-expressible — q86). width/height carry the stream's
      // (channels, sampleSizeInBits). Undecodable payloads quarantine.
      val parsed =
        try {
          val ais = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          try Some((ais.getFormat, ais.readAllBytes()))
          finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed match {
        case None => quarantined
        case Some((fmt, data)) =>
          val frameSize = math.max(1, fmt.getFrameSize)
          val counts = new Array[Long](16)
          var i = 0
          while (i < data.length) { counts((data(i) & 0xff) >> 4) += 1L; i += 1 }
          Decoded(
            fmt.getChannels, fmt.getSampleSizeInBits, data.length / frameSize,
            normalize(counts), counts)
      }
    case _ =>
      val n = bytes.length
      // deterministic STUB dimensions from payload size (video only)
      val (w, h, frames) = (64 + n % 577, 64 + n % 353, 1 + n % 97)
      // real feature shape: fixed-width byte histogram (16 bins), integer
      // counts kept beside the normalized floats
      val counts = new Array[Long](16)
      var i = 0
      while (i < n) { counts((bytes(i) & 0xff) >> 4) += 1L; i += 1 }
      Decoded(w, h, frames, normalize(counts), counts)
  }
}
