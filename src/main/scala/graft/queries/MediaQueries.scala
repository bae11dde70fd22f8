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
    ),
    // Exact media dedup: the multimodal analog of q20 — blobs grouped by
    // (content hash, byte size), keeping the lowest doc_id as the
    // representative. One shuffle on the hash; at 100 TB the first pass
    // of any media-dedup pipeline (hash computed in the scan projection,
    // payload bytes never shuffled — only the 16-byte digest + size).
    Q(
      "q69_media_dedup",
      (s, dir) =>
        Tables
          .documents(s, dir)
          .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("content"))
          .groupBy(
            md5(col("content")).as("content_md5"),
            octet_length(col("content")).cast("long").as("n_bytes")
          )
          .agg(min(col("doc_id")).as("rep_doc"), count(lit(1)).as("n_copies"))
          .orderBy("rep_doc"),
      Some("""SELECT md5(text) AS content_md5,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(min(doc_id) AS BIGINT) AS rep_doc,
        CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY 1, 2 ORDER BY rep_doc""")
    )
  )
}
