package graft

import graft.ops.{BarOps, Tables}
import graft.streaming.StreamBars
import org.scalatest.funsuite.AnyFunSuite

/** Batch-stream parity (SURVEY.md §5.2.4): the Structured Streaming
  * day-bar build must produce exactly the batch operator's rows.
  */
class StreamParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("streaming day bars equal batch day bars on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = BarOps
      .dayBars(Tables.events(spark, dir))
      .orderBy("user_id", "day")
      .collect()
      .toSeq
    val stream = StreamBars
      .runDayBars(spark, s"$dir/events.parquet")
      .collect()
      .toSeq
    assert(stream.map(_.toSeq) == batch.map(_.toSeq))
  }

  test("stateful streaming features stay batch-exact across MULTIPLE micro-batches") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // split at a day boundary: batch 1 = days ≤ 20240120, batch 2 = rest.
    // Boundary days are fully contained in one batch, so batch-1's
    // provisional rows are already final and the only duplicates are
    // exact; distinct(output) must equal the batch pipeline.
    val staged = java.nio.file.Files.createTempDirectory("graft_s04mb_").toAbsolutePath.toString
    val ev = Tables.events(spark, dir)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$staged/_w"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$staged/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val day = graft.ops.TimeCodec.dayInt(col("ts"))
    writeOne(ev.filter(day <= 20240120L), "ev0.parquet", 1000000L)
    writeOne(ev.filter(day > 20240120L), "ev1.parquet", 2000000L)

    val batch = graft.pipeline.Features.featuresFull(ev).collect().map(_.toSeq).toSet
    val cols = graft.pipeline.Features.featuresFull(ev).columns
    val stream = graft.streaming.StreamFeatures
      .runFeatures(spark, s"$staged/ev0.parquet", maxFilesPerTrigger = Some(1), fileGlob = "ev*.parquet")
      .selectExpr(cols: _*)
      .distinct()
      .collect()
      .map(_.toSeq)
    assert(stream.length == batch.size)
    assert(stream.toSet == batch)
  }

  test("stateful streaming features equal the batch flagship pipeline on sf0.001 (bit-exact)") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.pipeline.Features
      .featuresFull(Tables.events(spark, dir))
      .collect()
      .toSeq
    val cols = graft.pipeline.Features
      .featuresFull(Tables.events(spark, dir))
      .columns
    val stream = graft.streaming.StreamFeatures
      .runFeatures(spark, s"$dir/events.parquet")
      .selectExpr(cols: _*)
      .collect()
      .toSeq
    assert(stream.map(_.toSeq) == batch.map(_.toSeq))
  }
}
