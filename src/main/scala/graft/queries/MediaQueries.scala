package graft.queries

import graft.multimodal.Media
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** q40 + s05 — multimodal binary-column surface: binary transport with
  * metadata (oracle-checked) and the batched decode/feature-extract
  * pipeline (stub codec, rows-only check).
  */
object MediaQueries {

  val all: Seq[Q] = Seq(
    // Binary transport sanity: byte length + content hash of the binary
    // payload must round-trip identically through both engines' blob
    // handling.
    Q(
      "q40_binary_meta",
      (s, dir) =>
        Tables
          .documents(s, dir)
          .select(
            col("doc_id"),
            octet_length(to_binary(col("text"), lit("utf-8"))).cast("long").as("n_bytes"),
            md5(to_binary(col("text"), lit("utf-8"))).as("content_md5")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        md5(text) AS content_md5 FROM documents ORDER BY doc_id""")
    ),
    // Batched partition-level decode + feature extraction over the media
    // table (stub codec — deterministic fake; plumbing is real).
    Q(
      "s05_media_features",
      (s, dir) => {
        val media = Media.fromDocuments(
          Tables.documents(s, dir).repartition(col("doc_id")))
        Media
          .extractFeatures(media)
          .toDF()
          .select(
            col("doc_id"),
            col("kind"),
            col("width"),
            col("height"),
            col("n_frames"),
            col("out_width"),
            col("out_height"),
            col("n_sampled_frames"),
            round(element_at(col("feature"), 1), 6).as("f0")
          )
          .orderBy("doc_id")
      },
      None
    )
  )
}
