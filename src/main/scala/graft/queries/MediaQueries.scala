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
    // table. IMAGE rows carry real generated PNGs and are decoded by
    // javax.imageio (width/height/histogram from actual pixels);
    // audio/video keep the deterministic stub codec.
    Q(
      "s05_media_features",
      (s, dir) => {
        import s.implicits._
        val staged = Media.stageDecodable(
          Tables.documents(s, dir).repartition(col("doc_id")),
          dir
        )
        val media = s.read.parquet(staged).as[Media.MediaRow]
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
    // Audio feature histogram (q86): the stub audio decode's EXACT
    // integer bin counts (byte high-nibble histogram) + frame count,
    // through the real extractFeatures mapPartitions path — the
    // oracle-checked facet of the media feature pipeline (the float
    // `feature` vector is these counts normalized; image decode stays
    // rows-only in s05 because PNG decode isn't SQL-expressible).
    // Oracle counts code points, which equal bytes on this corpus
    // (ASCII-only, asserted: octet_length == length for every doc).
    Q(
      "q86_audio_histogram",
      (s, dir) => {
        val media = Media.fromDocuments(Tables.documents(s, dir).repartition(col("doc_id")))
        Media
          .extractFeatures(media.filter(col("kind") === "audio"))
          .toDF()
          .select(
            col("doc_id") +:
              col("n_frames").cast("long").as("n_frames") +:
              (0 until 16).map(j => element_at(col("hist_counts"), j + 1).as(s"b$j")): _*
          )
          .orderBy("doc_id")
      },
      Some {
        val bins = (0 until 16)
          .map(j => s"CAST(len(list_filter(nib, x -> x = $j)) AS BIGINT) AS b$j")
          .mkString(", ")
        s"""WITH a AS (SELECT doc_id, text, octet_length(encode(text)) AS n
              FROM documents WHERE doc_id % 3 = 1),
          c AS (SELECT doc_id, n,
                  list_transform(generate_series(1, length(text)),
                                 i -> ord(substring(text, i, 1)) // 16) AS nib
                FROM a)
          SELECT doc_id, CAST(1 + n % 977 AS BIGINT) AS n_frames, $bins
          FROM c ORDER BY doc_id"""
      }
    ),
    // Per-kind media storage stats: object count, total/max bytes, and
    // DEDUP-AWARE unique-content count per media kind — the storage
    // census a multimodal corpus audit starts with. One hash-agg over
    // the media table (kind domain ≤3, partial aggregation is map-side;
    // the distinct-digest count shuffles digests, never payloads).
    Q(
      "q78_media_stats",
      (s, dir) => {
        val m = Media.fromDocuments(Tables.documents(s, dir)).toDF()
        m.groupBy("kind")
          .agg(
            count(lit(1)).as("n_objects"),
            sum(col("size_bytes")).as("total_bytes"),
            max(col("size_bytes")).as("max_bytes"),
            countDistinct(md5(col("content"))).as("n_unique")
          )
          .orderBy("kind")
      },
      Some("""SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
        CAST(count(*) AS BIGINT) AS n_objects,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
        CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
        FROM documents GROUP BY 1 ORDER BY kind""")
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
