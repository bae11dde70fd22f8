package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** s59 — streaming DATA-QUALITY monitor: q193's curation gates evaluated
  * per ingest epoch, with a keep-rate floor that raises a breach flag the
  * moment a batch's quality collapses — the guardrail a production ingest
  * runs BESIDE the pipeline (a crawler that starts delivering boilerplate
  * should page someone at the batch that did it, not after the corpus is
  * poisoned). The monitor is the streaming face of the q193/q198 family:
  *
  *   - gates per doc, all map-side inside the epoch: language → length
  *     (40-90 words) → repetition (distinct-word ratio ≥ 40%) → q187's
  *     hashing-trick classifier (logit ≥ 0, the integer aggregate() HOF
  *     — no explode). The cross-doc DEDUP gate is deliberately absent:
  *     it needs cross-epoch state and is owned by s11/s12/s17; a
  *     monitor must stay stateless per batch to be cheap;
  *   - per epoch: survivor counts down the chain, keep rate in bp, and
  *     breach = keep_bp < KeepFloorBp (500 — measured to be LIVE: the
  *     doc_id<250 epoch keeps 480 bp at sf0.01 and trips it; the same
  *     epoch keeps 600/720 bp at sf0.001/sf0.1 and doesn't — the flag
  *     moves with data, it is not a constant);
  *   - results land in an epoch-keyed map via computeIfAbsent (the s34
  *     double-advance guard): a re-delivered epoch re-computes the same
  *     census and cannot double-record.
  *
  * Scale shape: per-epoch work is one map-side pass over the batch +
  * a single partial-agg census; driver traffic per epoch is ONE row of
  * gate counts. Nothing carried between epochs, nothing grows with the
  * corpus.
  *
  * Oracle: the identical gate arithmetic per epoch slice (doc_id < 250
  * is epoch 0 — the stageDocBatches split), stream ≡ batch under
  * AvailableNow.
  */
object StreamQuality {

  /** Alert floor in basis points: a batch keeping less trips the flag. */
  val KeepFloorBp = 500L

  def streamQualityMonitor(outer: SparkSession, dir: String): DataFrame = {
    val s = StreamSessions.tuned(outer)
    val staged = Watermarks.stageDocBatches(s, dir)
    val schema = s.read.parquet(s"$staged/0.parquet").schema
    val base = java.nio.file.Files.createTempDirectory("graft_s59_").toAbsolutePath

    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Long, Long, Long)]()

    val q = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", staged)
      .parquet(s"$staged/[01].parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        val ws = split(col("text"), " ")
        val r = b
          .select(
            col("lang"),
            size(ws).cast("long").as("nw"),
            size(array_distinct(ws)).cast("long").as("ndw"),
            aggregate(
              transform(ws, w => {
                val bb = pmod(conv(substring(md5(w), 1, 15), 16, 10).cast("long"), lit(64L))
                (bb * bb * 31L + bb * 7L) % 21L - 10L
              }),
              lit(0L), (acc, x) => acc + x).as("logit"))
          .withColumn("f_lang", col("lang") === "en")
          .withColumn("f_len", col("f_lang") && col("nw").between(40L, 90L))
          .withColumn("f_rep", col("f_len") && col("ndw") * 100L >= col("nw") * 40L)
          .withColumn("f_keep", col("f_rep") && col("logit") >= 0L)
          .agg(
            count(lit(1)),
            sum(when(col("f_lang"), 1L).otherwise(0L)),
            sum(when(col("f_len"), 1L).otherwise(0L)),
            sum(when(col("f_rep"), 1L).otherwise(0L)),
            sum(when(col("f_keep"), 1L).otherwise(0L)))
          .head()
        results.computeIfAbsent(
          epoch,
          _ => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    require(results.size() == 2, s"s59 expected 2 epochs, got ${results.size()}")
    import outer.implicits._
    import scala.jdk.CollectionConverters._
    results.asScala.toSeq.sortBy(_._1)
      .map { case (epoch, (n, nl, nle, nr, nk)) =>
        val bp = nk * 10000L / n
        (epoch, n, nl, nle, nr, nk, bp, bp < KeepFloorBp)
      }
      .toDF("epoch", "n_docs", "n_lang", "n_len", "n_rep", "n_keep",
        "keep_bp", "breach")
      .orderBy("epoch")
  }
}
