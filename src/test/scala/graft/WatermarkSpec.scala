package graft

import graft.ops.Tables
import graft.streaming.Watermarks
import org.scalatest.funsuite.AnyFunSuite

/** Watermark/late-data semantics vs a Scala model of the three-batch
  * trace (see Watermarks scaladoc): replayed old rows arriving after
  * their windows were finalized must be DROPPED — counts must not double
  * — and windows past the final watermark must be withheld.
  */
class WatermarkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("late replays behind the watermark are dropped; open windows are withheld") {
    val dir = "/root/testdata/sf0.001"
    val got = Watermarks
      .lateDataCounts(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
      .sorted

    val evs = Tables
      .events(spark, dir)
      .selectExpr("event_id", "CAST(ts AS LONG) AS sec", "user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dayS = 86400L
    def winStart(sec: Long) = sec - java.lang.Math.floorMod(sec, dayS)
    def dayInt(ws: Long): Long = {
      val d = java.time.LocalDateTime.ofEpochSecond(ws, 0, java.time.ZoneOffset.UTC)
      d.getYear * 10000L + d.getMonthValue * 100L + d.getDayOfMonth
    }
    // batch-2 replays are all late beyond the watermark set by batch 1 →
    // dropped; so expected counts = each original row once, and only
    // windows closed by the final watermark are emitted.
    val finalW = evs.map(_._2).max - dayS
    val expect = evs
      .groupBy(e => (e._3, winStart(e._2)))
      .collect { case ((u, ws), rows) if ws + dayS <= finalW => (u, dayInt(ws), rows.length.toLong) }
      .toSeq
      .sorted

    assert(got == expect)
    // sanity: some windows were withheld (still open at query end)
    val all = evs.groupBy(e => (e._3, winStart(e._2))).size
    assert(expect.size < all, "expected open windows to be withheld")
  }
}
