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
