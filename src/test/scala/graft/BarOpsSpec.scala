package graft

import graft.ops.{BarOps, TimeCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Day-bar formation + time codecs on hand-built events. */
class BarOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("time codecs produce HHmmss / yyyyMMdd longs") {
    val df = Seq(ts("2024-03-05 09:31:07")).toDF("ts")
    val (d, t) = df
      .select(TimeCodec.dayInt(col("ts")), TimeCodec.timeInt(col("ts")))
      .as[(Long, Long)]
      .head()
    assert(d == 20240305L && t == 93107L)
  }

  test("dayBars: open/close by ts order, high/low/volume, day grain") {
    val events = Seq(
      // user 1, day 1: three events out of insertion order
      (1L, ts("2024-01-02 10:00:00"), 105.0),
      (1L, ts("2024-01-02 09:00:00"), 100.0),
      (1L, ts("2024-01-02 16:00:00"), 95.0),
      // user 1, day 2: single event
      (1L, ts("2024-01-03 11:00:00"), 200.0),
      // user 2, day 1
      (2L, ts("2024-01-02 12:00:00"), 50.0)
    ).toDF("user_id", "ts", "value")

    val bars = BarOps.dayBars(events).orderBy("user_id", "day")
      .select("user_id", "day", "time", "open", "high", "low", "close", "volume")
      .as[(Long, Long, Long, Double, Double, Double, Double, Long)]
      .collect()

    assert(bars(0) == ((1L, 20240102L, 160000L, 100.0, 105.0, 95.0, 95.0, 3L)))
    assert(bars(1) == ((1L, 20240103L, 110000L, 200.0, 200.0, 200.0, 200.0, 1L)))
    assert(bars(2) == ((2L, 20240102L, 120000L, 50.0, 50.0, 50.0, 50.0, 1L)))
  }
}
