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
  * The actual media codecs are NOT available in this environment, so
  * `MediaCodec.decode` is a clearly-marked STUB with a deterministic fake
  * (see `MediaCodec.DecodeIsStub`): the Spark-side plumbing — schema,
  * binary transport, partitioning, batch shape, feature vector layout —
  * is real and tested; swapping in a real codec changes only the stub
  * body.
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
      feature: Array[Float]
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
        MediaFeatures(m.doc_id, m.kind, d.width, d.height, d.nFrames, ow, oh, sampled.length, d.histogram)
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

/** STUB media codec — deterministic fake in place of real image/audio/
  * video libraries (not present in this container). Every value is a pure
  * function of the payload bytes so tests and the driver's rows-only check
  * are reproducible.
  */
object MediaCodec {

  /** Marker: decode is a stub; replace `decode` with a real codec binding
    * (e.g. TwelveMonkeys/JCodec on the JVM) to productionize.
    */
  final val DecodeIsStub = true

  case class Decoded(width: Int, height: Int, nFrames: Int, histogram: Array[Float])

  def decode(kind: String, bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    // deterministic fake dimensions from payload size
    val (w, h, frames) = kind match {
      case "image" => (64 + n % 577, 64 + n % 353, 1)
      case "audio" => (1, 1, 1 + n % 977) // "frames" = sample blocks
      case _ => (64 + n % 577, 64 + n % 353, 1 + n % 97)
    }
    // real feature shape: fixed-width normalized byte histogram (16 bins)
    val hist = new Array[Float](16)
    var i = 0
    while (i < n) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n.toFloat; j += 1 } }
    Decoded(w, h, frames, hist)
  }
}
