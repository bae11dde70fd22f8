package graft.streaming

import graft.ops.{Hashing, Hll, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** s36 — streaming maintenance of q170's exact-integer HLL registers:
  * the third mergeable-sketch demo (s33 summed histogram cells; this
  * one MAXes registers — the other associative merge a streaming sketch
  * pipeline needs). Each micro-batch reduces map-side to its own ≤64
  * (bucket, max rank) register partial; the running sketch is the
  * register-wise MAX over an epoch-keyed ledger (idempotent under
  * foreachBatch retry — a re-delivered epoch overwrites its own
  * registers, and max-merge makes even a double-merge harmless, the
  * idempotence s33's sums had to buy with the ledger alone). The final
  * read-off reuses the q170 kernel (integer harmonic sum + DECIMAL
  * estimate) and the oracle recomputes the registers from scratch over
  * the full corpus — stream-maintained ≡ batch, the q170 merge audit
  * exercised across epochs instead of halves. Per epoch a
  * 1000-executor job ships 64 registers to the driver, never rows.
  *
  * Reference anchor: the bounded micro-batch drain cadence of
  * `ExporterDatabaseManager.cs:19-106`, re-expressed as per-epoch
  * register partials.
  */
object StreamHll {

  def streamedHllRegisters(outer: SparkSession, dir: String): DataFrame = {
    val s = StreamSessions.tuned(outer)
    val staged = Watermarks.stageDocBatches(s, dir)
    val schema = s.read.parquet(s"$staged/0.parquet").schema
    val base = java.nio.file.Files.createTempDirectory("graft_s36_").toAbsolutePath
    // epoch -> (bucket -> max rank): per-epoch register partials
    val partials =
      new java.util.concurrent.ConcurrentHashMap[Long, Map[Long, Long]]()
    val q = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", staged)
      .parquet(s"$staged/[01].parquet")
      .select(Hashing.h60(col("text")).as("h"))
      .select(Hll.bucketCol.as("bucket"), Hll.rankCol.as("rk"))
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        val regs = b
          .groupBy("bucket")
          .agg(max("rk").as("mr"))
          .collect() // ≤64 registers — the bounded-collect contract
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        partials.put(epoch, regs)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    import scala.jdk.CollectionConverters._
    val eps = partials.asScala.toMap
    require(eps.size == 2, s"s36 expected 2 epochs, got ${eps.size}")
    // the register-wise MAX — the associative HLL merge
    val merged: Map[Long, Long] =
      eps.values.flatten.groupMapReduce(_._1)(_._2)(math.max)

    import s.implicits._
    val rw = merged.toSeq.sortBy(_._1).toDF("bucket", "mr")
    val n = Tables.documents(s, dir).agg(countDistinct(col("text")).as("n_exact"))
    Hll
      .harmonic(rw)
      .crossJoin(broadcast(n))
      .select(
        lit(Hll.M.toLong).as("m"),
        col("n_exact"),
        Hll.estimate.as("est_distinct"),
        col("n_regs").as("n_registers_used"))
      .withColumn("err_bp", expr("abs(est_distinct - n_exact) * 10000 div n_exact"))
      .withColumn("within_3sigma", col("err_bp") <= 3900L)
      .withColumn("n_epochs", lit(2L))
      .select(
        col("m"), col("n_exact"), col("est_distinct"), col("err_bp"),
        col("within_3sigma"), col("n_registers_used"), col("n_epochs"))
      .orderBy("m")
  }
}
